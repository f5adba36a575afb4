#!/usr/bin/env python
"""Hypersim dataset tooling: download, partition, metadata precompute.

Reference-equivalent of the hypersim_src tooling layer (reference:
datasets/hypersim_src/_utils/download.py selective downloader,
zip_partitions.py, metadata/precompute_scene_bnds_all.py,
precompute_metadata_all.py, precompute_semantic_classes_all.py,
metadata/ABC_select.py difficulty-split selection).

Subcommands:
  download     — fetch scene zips from the public Hypersim release and
                 extract only the members needed for training
  partition    — tar.gz scenes into N roughly-equal partitions
  metadata     — precompute all_scenes_metadata.json (shuffled image
                 lists with a fixed seed, scene boundaries, semantic
                 class inventories) so training runs skip the expensive
                 per-scene recomputation
  abc-select   — split scenes into difficulty buckets A/B/C by a
                 baseline metric csv (reference: ABC_select.py)
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import tarfile

import numpy as np

URL_BASE = ("https://docs-assets.developer.apple.com/ml-research/datasets/"
            "hypersim/v1/scenes")
# members needed by the training pipeline
KEEP_PATTERNS = (
    "_detail/metadata_scene.csv",
    "_detail/cam_",
    "images/scene_cam_00_final_hdf5/",
    "images/scene_cam_00_geometry_hdf5/",
    "images/scene_cam_01_final_hdf5/",
    "images/scene_cam_01_geometry_hdf5/",
)


def cmd_download(args):
    import io
    import urllib.request
    import zipfile

    os.makedirs(args.out_dir, exist_ok=True)
    for scene in args.scenes:
        url = f"{URL_BASE}/{scene}.zip"
        print(f"downloading {url}")
        with urllib.request.urlopen(url) as r:
            data = io.BytesIO(r.read())
        with zipfile.ZipFile(data) as z:
            members = [
                m for m in z.namelist()
                if any(p in m for p in KEEP_PATTERNS)
            ]
            z.extractall(args.out_dir, members=members)
        print(f"extracted {len(members)} members for {scene}")


def cmd_partition(args):
    scenes = sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d)))
    parts = [scenes[i::args.n] for i in range(args.n)]
    os.makedirs(args.out_dir, exist_ok=True)
    for i, part in enumerate(parts):
        path = os.path.join(args.out_dir, f"partition_{i:02d}.tar.gz")
        with tarfile.open(path, "w:gz") as tar:
            for scene in part:
                tar.add(os.path.join(args.data_root, scene), arcname=scene)
        print(f"{path}: {len(part)} scenes")


def cmd_metadata(args):
    """Per-scene image lists (seeded shuffle for reproducible splits),
    boundaries and semantic inventories -> all_scenes_metadata.json."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from normal_clustering_nerf_tpu.datasets.hypersim import HypersimDataset

    out = {}
    scenes = args.scenes or sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d)))
    for scene in scenes:
        root = os.path.join(args.data_root, scene)
        try:
            ds = HypersimDataset(
                root, split="all" if False else "train", split_factor=1.0,
                load_depth_gt=True, load_sem_gt=args.semantics, seed=args.seed)
        except Exception as e:
            print(f"{scene}: FAILED ({e})")
            continue
        s = ds.load()
        meta = dict(ds.scene_metadata)
        # recompute boundary entries from the loaded scene
        meta["scene_boundary"] = {
            "xyz_cam_min": np.asarray(s.xyz_cam_min).tolist(),
            "xyz_cam_max": np.asarray(s.xyz_cam_max).tolist(),
        }
        if s.class_metadata:
            meta["semantic_metadata"] = {
                k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in next(iter(s.class_metadata.values())).items()
            }
        out[scene] = meta
        print(f"{scene}: {s.n_images} images")
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}")


def cmd_abc_select(args):
    """Split scenes into difficulty buckets by baseline PSNR
    (reference: metadata/ABC_select.py): A = easiest third, C = hardest."""
    import pandas as pd

    df = pd.read_csv(args.results_csv)
    scene_col = "info/scene" if "info/scene" in df else "param/scene_name"
    df = df.sort_values(by=args.metric, ascending=False)
    scenes = df[scene_col].tolist()
    n = len(scenes)
    buckets = {
        "A": scenes[: n // 3],
        "B": scenes[n // 3: 2 * n // 3],
        "C": scenes[2 * n // 3:],
    }
    os.makedirs(args.out_dir, exist_ok=True)
    for k, v in buckets.items():
        path = os.path.join(args.out_dir, f"hypersim_{k}_scenes.json")
        with open(path, "w") as f:
            json.dump(v, f, indent=1)
        print(f"{path}: {len(v)} scenes")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("download")
    d.add_argument("--out_dir", required=True)
    d.add_argument("--scenes", nargs="+", required=True)
    d.set_defaults(fn=cmd_download)

    pt = sub.add_parser("partition")
    pt.add_argument("--data_root", required=True)
    pt.add_argument("--out_dir", required=True)
    pt.add_argument("-n", type=int, default=8)
    pt.set_defaults(fn=cmd_partition)

    m = sub.add_parser("metadata")
    m.add_argument("--data_root", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--scenes", nargs="*", default=None)
    m.add_argument("--semantics", action="store_true")
    m.add_argument("--seed", type=int, default=1234)
    m.set_defaults(fn=cmd_metadata)

    a = sub.add_parser("abc-select")
    a.add_argument("--results_csv", required=True)
    a.add_argument("--metric", default="metric/psnr")
    a.add_argument("--out_dir", required=True)
    a.set_defaults(fn=cmd_abc_select)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
