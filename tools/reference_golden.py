"""Dump golden reference outputs for the checkpoint-port parity check.

Run this INSIDE the reference V-DETR environment (torch + CUDA +
MinkowskiEngine + the reference repo on PYTHONPATH), then feed the
resulting golden.npz to `tools/verify_port.py verify ... --golden`:

  # in the reference env
  python reference_golden.py --reference /path/to/V-DETR \
      --ckpt scannet_540ep.pth --probe probe_scan.npz --out golden.npz

  # back on TPU
  python tools/verify_port.py verify scannet_540ep.pth \
      --golden golden.npz --search-perm

probe_scan.npz comes from `python tools/verify_port.py probe`. This file
has no vdetr_tpu dependencies on purpose; it drives the reference's own
build_model/forward (reference main.py:503-517, models/model_vdetr.py:328)
on the probe scan and records the tensors verify_port compares.
"""

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True,
                   help="path to the V-DETR reference repo")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--probe", default="probe_scan.npz")
    p.add_argument("--out", default="golden.npz")
    p.add_argument("--device", default="cuda")
    args = p.parse_args()

    sys.path.insert(0, args.reference)
    import torch
    from models import build_model  # reference models/__init__.py:8
    from datasets import build_dataset  # reference datasets/__init__.py:9

    ckpt = torch.load(args.ckpt, map_location="cpu")
    ck_args = ckpt["args"]
    ck_args.dataset_name = "scannet"
    ck_args.ngpus = 1
    # datasets are only needed for dataset_config (class count/anchors)
    try:
        _, dataset_config = build_dataset(ck_args)
    except Exception:
        from datasets.scannet import ScannetDatasetConfig

        dataset_config = ScannetDatasetConfig()

    model, _ = build_model(ck_args, dataset_config)
    missing, unexpected = model.load_state_dict(
        {k.replace("module.", ""): v for k, v in ckpt["model"].items()},
        strict=False,
    )
    print(f"load_state_dict: {len(missing)} missing, "
          f"{len(unexpected)} unexpected")
    model = model.to(args.device).eval()

    probe = np.load(args.probe)
    pts = probe["point_clouds"]
    if getattr(ck_args, "use_color", False):
        pts = np.concatenate([pts, probe["point_colors"]], -1)
    inputs = {
        "point_clouds": torch.from_numpy(pts).float().to(args.device),
        "point_cloud_dims_min": torch.from_numpy(
            probe["point_cloud_dims_min"]).float().to(args.device),
        "point_cloud_dims_max": torch.from_numpy(
            probe["point_cloud_dims_max"]).float().to(args.device),
    }
    with torch.no_grad():
        out = model(inputs)

    def grab(t):
        return t.detach().cpu().numpy()

    fin = out["outputs"]
    dump = {
        "seed_xyz": grab(out["seed_xyz"]),
        "seed_inds": grab(out["seed_inds"]),
        "enc.point_cls_logits": grab(
            out["enc_outputs"]["point_cls_logits"]),
        "outputs.center_unnormalized": grab(fin["center_unnormalized"]),
        "outputs.size_unnormalized": grab(fin["size_unnormalized"]),
        "outputs.sem_cls_logits": grab(fin["sem_cls_logits"]),
        "outputs.box_corners": grab(fin["box_corners"]),
        "outputs.objectness_prob": grab(fin["objectness_prob"]),
    }
    for i, aux in enumerate(out.get("aux_outputs", [])):
        dump[f"aux{i}.sem_cls_logits"] = grab(aux["sem_cls_logits"])
    np.savez(args.out, **dump)
    print(f"wrote {args.out}: "
          + ", ".join(f"{k}{v.shape}" for k, v in dump.items()))


if __name__ == "__main__":
    main()
