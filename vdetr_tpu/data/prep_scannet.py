"""Offline ScanNet preparation (reference scannet/load_scannet_data.py +
scannet/batch_load_scannet_data.py).

For each scan, reads the raw ScanNet release files
(`_vh_clean_2.ply`, `_vh_clean_2.0.010000.segs.json`,
`.aggregation.json`, `.txt` meta), axis-aligns the mesh with the
`axisAlignment` matrix from the meta file, maps raw categories to nyu40
ids via `scannetv2-labels.combined.tsv`, and writes:

  <scan>_vert.npy       (N, 6) xyz + rgb
  <scan>_normals.npy    (N, 3) area-weighted vertex normals (the reference
                        recomputes these from the raw ply at every load
                        when --use_normals, datasets/scannet.py:394-430)
  <scan>_sem_label.npy  (N,)   nyu40 semantic id per vertex
  <scan>_ins_label.npy  (N,)   1-based instance id (0 = unannotated)
  <scan>_bbox.npy       (K, 7) cx cy cz dx dy dz nyu40id, axis-aligned
                        boxes from instance point extents

Usage:
  python -m vdetr_tpu.data.prep_scannet --scans_dir scans/ \
      --labels_tsv scannetv2-labels.combined.tsv --out_dir scannet_data/
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict

import numpy as np

# classes whose instances get boxes (reference
# scannet/batch_load_scannet_data.py OBJ_CLASS_IDS)
OBJ_CLASS_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
)


def read_label_mapping(tsv_path: str, label_from="raw_category",
                       label_to="nyu40id") -> Dict[str, int]:
    mapping = {}
    with open(tsv_path, newline="") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            mapping[row[label_from]] = int(row[label_to])
    return mapping


def read_mesh_vertices_rgb(ply_path: str, return_faces: bool = False):
    from plyfile import PlyData

    with open(ply_path, "rb") as f:
        ply = PlyData.read(f)
    v = ply["vertex"].data
    out = np.stack(
        [v["x"], v["y"], v["z"], v["red"], v["green"], v["blue"]], axis=1
    ).astype(np.float32)
    if return_faces:
        faces = np.vstack(ply["face"].data["vertex_indices"]).astype(np.int64)
        return out, faces
    return out


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (reference datasets/scannet.py:397-430
    face_normal/vertex_normal, computed there lazily at load time from the
    raw ply; exported offline here)."""
    v01 = verts[faces[:, 1], :3] - verts[faces[:, 0], :3]
    v02 = verts[faces[:, 2], :3] - verts[faces[:, 0], :3]
    vec = np.cross(v01, v02)
    length = np.sqrt((vec ** 2).sum(1, keepdims=True)) + 1e-8
    nf = vec / length           # unit face normal
    area = length * 0.5
    weighted = nf * area        # reference weights by face area
    out = np.zeros((verts.shape[0], 3), np.float64)
    for k in range(3):
        np.add.at(out, faces[:, k], weighted)
    norm = np.sqrt((out ** 2).sum(1, keepdims=True)) + 1e-8
    return (out / norm).astype(np.float32)


def export_scan(scan_dir: str, scan_name: str, label_map: Dict[str, int]):
    mesh_file = os.path.join(scan_dir, scan_name + "_vh_clean_2.ply")
    agg_file = os.path.join(scan_dir, scan_name + ".aggregation.json")
    seg_file = os.path.join(
        scan_dir, scan_name + "_vh_clean_2.0.010000.segs.json"
    )
    meta_file = os.path.join(scan_dir, scan_name + ".txt")

    verts, faces = read_mesh_vertices_rgb(mesh_file, return_faces=True)

    # axis alignment from the meta file
    axis_align = np.eye(4)
    with open(meta_file) as f:
        for line in f:
            if line.startswith("axisAlignment"):
                vals = [float(x) for x in line.split("=")[1].split()]
                axis_align = np.array(vals).reshape(4, 4)
                break
    pts = np.ones((verts.shape[0], 4))
    pts[:, :3] = verts[:, :3]
    verts[:, :3] = (pts @ axis_align.T)[:, :3]
    # normals from the aligned mesh (alignment is rigid, so this equals
    # aligning raw-mesh normals)
    normals = vertex_normals(verts, faces)

    with open(seg_file) as f:
        seg_to_vert: Dict[int, list] = {}
        seg_indices = json.load(f)["segIndices"]
        for i, s in enumerate(seg_indices):
            seg_to_vert.setdefault(s, []).append(i)

    with open(agg_file) as f:
        agg = json.load(f)["segGroups"]

    n = verts.shape[0]
    sem_label = np.zeros(n, np.int64)
    ins_label = np.zeros(n, np.int64)
    instance_boxes = []
    for obj in agg:
        obj_id = obj["objectId"] + 1  # 1-based
        nyu40 = label_map.get(obj["label"], 0)
        vert_ids = []
        for seg in obj["segments"]:
            vert_ids.extend(seg_to_vert.get(seg, []))
        vert_ids = np.asarray(vert_ids, np.int64)
        if len(vert_ids) == 0:
            continue
        sem_label[vert_ids] = nyu40
        ins_label[vert_ids] = obj_id
        if nyu40 in OBJ_CLASS_IDS:
            obj_pts = verts[vert_ids, :3]
            mn, mx = obj_pts.min(0), obj_pts.max(0)
            center = (mn + mx) / 2
            size = mx - mn
            instance_boxes.append(np.concatenate([center, size, [nyu40]]))
    boxes = (np.stack(instance_boxes) if instance_boxes
             else np.zeros((0, 7)))
    return verts, normals, sem_label, ins_label, boxes.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans_dir", required=True)
    ap.add_argument("--labels_tsv", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scan_names", nargs="*", default=None)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    label_map = read_label_mapping(args.labels_tsv)
    scans = args.scan_names or sorted(os.listdir(args.scans_dir))
    for scan in scans:
        scan_dir = os.path.join(args.scans_dir, scan)
        if not os.path.isdir(scan_dir):
            continue
        out_prefix = os.path.join(args.out_dir, scan)
        if os.path.exists(out_prefix + "_bbox.npy"):
            continue
        try:
            verts, normals, sem, ins, boxes = export_scan(scan_dir, scan,
                                                          label_map)
        except FileNotFoundError as e:
            print(f"skip {scan}: {e}")
            continue
        np.save(out_prefix + "_vert.npy", verts)
        np.save(out_prefix + "_normals.npy", normals)
        np.save(out_prefix + "_sem_label.npy", sem)
        np.save(out_prefix + "_ins_label.npy", ins)
        np.save(out_prefix + "_bbox.npy", boxes)
        print(f"{scan}: {verts.shape[0]} verts, {boxes.shape[0]} boxes")


if __name__ == "__main__":
    main()
