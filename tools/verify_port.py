"""Checkpoint-port verification harness (reference scannet_540ep.pth).

The one uncertain degree of freedom in the torch->jax weight port is
MinkowskiEngine's kernel-offset enumeration order (the (27, C_in, C_out)
kernel's first axis). Ours is x-major/z-fastest over offsets -1..1
(ops/sparse_conv._offsets); ME's order is one of the 48 axis
relabelings of the same 3x3x3 grid (axis permutation x sign flips —
both are lexicographic enumerations of a cube). This tool pins it down:

  python tools/verify_port.py roundtrip
      Self-test: export a random model to the reference state-dict layout
      and re-import; exact round trip (also covered by pytest).

  python tools/verify_port.py probe [--out probe_scan.npz]
      Write the deterministic probe scan consumed by both this tool and
      tools/reference_golden.py (run the latter in the reference's
      torch/CUDA environment to produce golden.npz).

  python tools/verify_port.py calibrate-me
      With MinkowskiEngine installed: empirically read off ME's kernel
      slot -> offset mapping with a delta-probe convolution and print the
      KERNEL_OFFSET_PERMUTATION to encode in train/torch_import.py.

  python tools/verify_port.py verify CKPT.pth [--golden golden.npz]
      [--search-perm] [--num-points N]
      Import CKPT (conversion report must be clean), forward the probe
      scan, print per-output digests. With --golden: compare against the
      reference's outputs (max |diff|, cosine). With --search-perm: rerun
      the forward under all 48 candidate kernel-grid relabelings (jit
      compiled once; only params change) and rank them by final-logit
      cosine, confirming or fixing the identity assumption.

Reference checkpoint layout: /root/reference/utils/io.py:23-29.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_SEED = 20260816
PROBE_NUM_POINTS = 100000


def make_probe_scan(num_points: int = PROBE_NUM_POINTS,
                    seed: int = PROBE_SEED):
    """Deterministic fabricated scan: room-like extent, clustered blobs so
    FPS/voxelization see realistic non-uniform density. Pure numpy; the
    identical function is inlined in tools/reference_golden.py (keep in
    sync)."""
    rng = np.random.RandomState(seed)
    extent = np.array([6.0, 5.0, 2.8], np.float32)
    n_blob = num_points // 2
    centers = rng.rand(32, 3).astype(np.float32) * extent
    blob = (
        centers[rng.randint(0, 32, n_blob)]
        + rng.randn(n_blob, 3).astype(np.float32) * 0.25
    )
    uniform = rng.rand(num_points - n_blob, 3).astype(np.float32) * extent
    pts = np.clip(np.concatenate([blob, uniform], 0), 0, extent)
    colors = rng.rand(num_points, 3).astype(np.float32)
    return {
        "point_clouds": pts[None],
        "point_colors": colors[None],
        "point_cloud_dims_min": pts.min(0)[None],
        "point_cloud_dims_max": pts.max(0)[None],
    }


def relabeling_perms(axes, signs):
    """Permutations for one candidate enumeration (axis order `axes` in
    S3, per-axis direction `signs` in {+1,-1}^3) of both kernel grids:
    perms[K][i] = candidate slot holding OUR slot-i offset, i.e. usable as
    torch_import.KERNEL_OFFSET_PERMUTATION (ours_k[i] = me_k[perm[i]]).
    Covers the 3^3 convs (offsets -1..1) and the 2^3 FPN transpose convs
    (offsets 0..1; a negative direction flips 0<->1)."""
    perms = {}
    for width, vals in ((3, (-1, 0, 1)), (2, (0, 1))):
        ours = list(itertools.product(vals, repeat=3))
        lo = vals[0]

        def slot(d):
            idx = 0
            for m in range(3):
                v = d[axes[m]]
                if signs[m] < 0:
                    v = vals[-1] + lo - v  # reverse the enumeration axis
                idx = idx * width + (v - lo)
            return idx

        perms[width ** 3] = np.array([slot(d) for d in ours], np.int64)
    return perms


def grid_relabelings():
    """All 48 candidate enumerations (name, perms-dict); the identity is
    included and marked."""
    out = []
    for axes in itertools.permutations(range(3)):
        for signs in itertools.product((1, -1), repeat=3):
            perms = relabeling_perms(axes, signs)
            ident = all(np.array_equal(p, np.arange(len(p)))
                        for p in perms.values())
            name = (f"axes={axes} signs={signs}"
                    + (" [identity]" if ident else ""))
            out.append((name, perms))
    return out


def _is_identity(perms):
    return all(np.array_equal(p, np.arange(len(p)))
               for p in perms.values())


# --------------------------------------------------------------------------


def cmd_probe(args):
    scan = make_probe_scan(args.num_points)
    np.savez(args.out, **scan)
    print(f"wrote {args.out}: "
          + ", ".join(f"{k}{v.shape}" for k, v in scan.items()))


def cmd_calibrate_me(args):
    """Delta-probe a 3^3 ME convolution to read the slot->offset map."""
    try:
        import MinkowskiEngine as ME
        import torch
    except ImportError as e:
        print(f"MinkowskiEngine unavailable ({e}); run this in the "
              "reference environment. The verify --search-perm path "
              "does not need ME.")
        return 1

    offsets = [(i, j, k)
               for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    # input: 27 voxels at the offsets, feature = distinctive scalar 2^-p
    coords = torch.tensor(
        [[0, *o] for o in offsets], dtype=torch.int32
    )
    feats = torch.tensor([[float(p + 1)] for p in range(27)])
    x = ME.SparseTensor(feats, coordinates=coords)
    conv = ME.MinkowskiConvolution(1, 27, kernel_size=3, stride=1,
                                   dimension=3, bias=False)
    with torch.no_grad():
        conv.kernel.zero_()
        for s in range(27):
            conv.kernel[s, 0, s] = 1.0
    y = conv(x)
    mask = (y.coordinates == torch.tensor([0, 0, 0, 0])).all(1)
    row = y.features[mask][0]  # (27,) out[s] = feat of voxel ME reaches
    me_slot_to_offset = {}
    for s in range(27):
        p = int(round(row[s].item())) - 1
        me_slot_to_offset[s] = offsets[p]
    print("ME 3^3 slot -> input offset relative to output:")
    for s, o in me_slot_to_offset.items():
        print(f"  {s:2d}: {o}")
    # ours: slot i holds offset offsets[i]; find perm with
    # ours_kernel[i] = me_kernel[perm[i]]
    inv = {o: s for s, o in me_slot_to_offset.items()}
    perm27 = np.array([inv[o] for o in offsets], np.int64)

    # 2^3 generative transpose (the FPN up blocks, model_vdetr.py:163-176):
    # a single coarse voxel emits 8 children; each output coordinate
    # reveals which slot reached it
    tconv = ME.MinkowskiGenerativeConvolutionTranspose(
        1, 8, kernel_size=2, stride=2, dimension=3, bias=False
    )
    with torch.no_grad():
        tconv.kernel.zero_()
        for s in range(8):
            tconv.kernel[s, 0, s] = 1.0
    x1 = ME.SparseTensor(
        torch.ones(1, 1), coordinates=torch.tensor([[0, 0, 0, 0]],
                                                   dtype=torch.int32),
        tensor_stride=2,
    )
    y1 = tconv(x1)
    ours8 = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    slot8 = {}
    for r in range(y1.coordinates.shape[0]):
        child = tuple(int(c) for c in y1.coordinates[r, 1:])
        s = int(y1.features[r].argmax())
        slot8[child] = s
    print("ME 2^3 transpose slot by child offset:", slot8)
    perm8 = np.array([slot8[o] for o in ours8], np.int64)

    if (np.array_equal(perm27, np.arange(27))
            and np.array_equal(perm8, np.arange(8))):
        print("ME order == ours (identity); KERNEL_OFFSET_PERMUTATION"
              " can stay None")
    else:
        print("KERNEL_OFFSET_PERMUTATION = {")
        print(f"  27: np.{perm27!r},")
        print(f"  8: np.{perm8!r},")
        print("}")
    return 0


def cmd_roundtrip(args):
    import jax

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.models import build_model
    from vdetr_tpu.train import torch_import as ti

    cfg = VDETRConfig(
        voxel_capacity=1024, min_stage_capacity=64, grid_extent=(64, 64, 32),
        preenc_npoints=64, nqueries=16, dec_nlayers=3, dec_dim=32,
        dec_ffn_dim=32, rpe_dim=16, inplanes=8, enc_dim=32, fps_impl="jax",
        num_points=256,
    )
    model = build_model(cfg, ScannetDatasetConfig())
    scan = make_probe_scan(256)
    inputs = {k: v for k, v in scan.items() if k != "point_colors"}
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = ti.build_reference_state_dict(params, stats, cfg)
    p2, s2, report = ti.convert_torch_state_dict(sd, cfg)
    assert not report["missing"] and not report["unused"], report
    fa, fb = ti._flatten(params), ti._flatten(p2)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
    print(f"roundtrip OK: {len(sd)} tensors exact")
    return 0


def _digest(name, a, b=None):
    a = np.asarray(a, np.float64)
    line = f"  {name:40s} mean={a.mean():+.5f} std={a.std():.5f}"
    if b is not None:
        b = np.asarray(b, np.float64)
        d = np.abs(a - b).max()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float((a * b).sum() / denom) if denom else 1.0
        line += f"  |diff|max={d:.3e} cos={cos:.6f}"
    print(line)


def cmd_verify(args):
    import jax
    import jax.numpy as jnp

    from vdetr_tpu.config import VDETRConfig, AUTO_TEST_IGNORE_KEYS
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.models import build_model
    from vdetr_tpu.train import torch_import as ti

    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    cfg = VDETRConfig()
    if "args" in ckpt:
        cfg = ti.reference_args_to_config(ckpt["args"], cfg,
                                          AUTO_TEST_IGNORE_KEYS)
        print(f"config from ckpt args: use_color={cfg.use_color} "
              f"dec_nlayers={cfg.dec_nlayers} hard_anchor={cfg.hard_anchor}")
    if args.num_points:
        cfg = cfg.replace(num_points=args.num_points)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    params, stats, report = ti.convert_torch_state_dict(sd, cfg)
    print(f"conversion: {len(report['missing'])} missing, "
          f"{len(report['unused'])} unused")
    for m in report["missing"][:10]:
        print(f"  missing: {m}")
    for u in report["unused"][:10]:
        print(f"  unused:  {u}")
    if report["missing"]:
        return 1

    model = build_model(cfg, ScannetDatasetConfig())
    scan = make_probe_scan(cfg.num_points)
    pts = scan["point_clouds"]
    if cfg.use_color:
        pts = np.concatenate([pts, scan["point_colors"]], -1)
    inputs = {
        "point_clouds": jnp.asarray(pts),
        "point_cloud_dims_min": jnp.asarray(scan["point_cloud_dims_min"]),
        "point_cloud_dims_max": jnp.asarray(scan["point_cloud_dims_max"]),
    }

    fwd = jax.jit(lambda v, i: model.apply(v, i, train=False))

    def run(params, stats):
        out = fwd({"params": jax.tree.map(jnp.asarray, params),
                   "batch_stats": jax.tree.map(jnp.asarray, stats)}, inputs)
        return jax.tree.map(np.asarray, out)

    golden = dict(np.load(args.golden)) if args.golden else None

    def compare(out, verbose=True):
        """Returns the parity score vs golden (or nan without golden):
        mean cosine of enc point-cls logits (directly on backbone
        features — most sensitive to kernel-order errors) and final
        sem-cls logits."""
        fin = out["outputs"]
        pairs = [
            ("seed_xyz", out["seed_xyz"]),
            ("enc.point_cls_logits",
             out["enc_outputs"]["point_cls_logits"]),
            ("outputs.center_unnormalized", fin["center_unnormalized"]),
            ("outputs.size_unnormalized", fin["size_unnormalized"]),
            ("outputs.sem_cls_logits", fin["sem_cls_logits"]),
        ]
        scored = []
        for name, a in pairs:
            g = golden.get(name) if golden else None
            if verbose:
                _digest(name, a, g)
            if g is not None and name in ("enc.point_cls_logits",
                                          "outputs.sem_cls_logits"):
                aa = np.asarray(a, np.float64).ravel()
                gg = np.asarray(g, np.float64).ravel()
                scored.append(float(
                    (aa * gg).sum()
                    / (np.linalg.norm(aa) * np.linalg.norm(gg) + 1e-30)
                ))
        return float(np.mean(scored)) if scored else np.nan

    out = run(params, stats)
    print("== identity kernel-offset order ==")
    base_cos = compare(out)

    if args.search_perm:
        if golden is None:
            print("--search-perm needs --golden (ranking is by final-"
                  "logit cosine vs the reference)")
            return 1
        print("== searching 48 kernel-grid relabelings ==")
        results = []
        for name, perms in grid_relabelings():
            ti.KERNEL_OFFSET_PERMUTATION = (
                None if _is_identity(perms) else perms
            )
            p2, s2, _ = ti.convert_torch_state_dict(sd, cfg)
            cos = compare(run(p2, s2), verbose=False)
            results.append((cos, name, perms))
            print(f"  cos={cos:+.6f}  {name}")
        ti.KERNEL_OFFSET_PERMUTATION = None
        results.sort(reverse=True, key=lambda r: r[0])
        cos, name, perms = results[0]
        print(f"best: cos={cos:.6f} {name}")
        if not _is_identity(perms):
            print("KERNEL_OFFSET_PERMUTATION = {")
            for k, pm in perms.items():
                print(f"  {k}: np."
                      + repr(pm).replace("array", "array") + ",")
            print("}")
    elif golden is not None:
        ok = base_cos > 0.999
        print(f"final-logit cosine {base_cos:.6f} -> "
              f"{'PARITY OK' if ok else 'MISMATCH (try --search-perm)'}")
        return 0 if ok else 1
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("probe")
    sp.add_argument("--out", default="probe_scan.npz")
    sp.add_argument("--num-points", type=int, default=PROBE_NUM_POINTS)
    sub.add_parser("calibrate-me")
    sub.add_parser("roundtrip")
    sv = sub.add_parser("verify")
    sv.add_argument("ckpt")
    sv.add_argument("--golden", default=None)
    sv.add_argument("--search-perm", action="store_true")
    sv.add_argument("--num-points", type=int, default=0)
    args = p.parse_args(argv)
    return {
        "probe": cmd_probe,
        "calibrate-me": cmd_calibrate_me,
        "roundtrip": cmd_roundtrip,
        "verify": cmd_verify,
    }[args.cmd](args) or 0


if __name__ == "__main__":
    sys.exit(main())
