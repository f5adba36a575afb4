#!/usr/bin/env python
"""SLURM-free multi-scene sweep launcher.

Replaces the reference's cluster job-script generators (reference:
experiments/hypersim/train_one_euler.py, train_all_euler.py,
train_ABC_euler.py): instead of emitting bash scripts for a SLURM
array, this driver runs train_nerf.py per scene — sequentially on one
host, or scene-parallel across the hosts of a pod via --num_hosts/
--host_id striding (each host trains its share of scenes on its own
chips; cross-host collectives are only needed *within* a scene, which
parallel/launch.py covers). Failure accounting matches the reference:
a scene without results.csv counts as failed, and `rerun-failed` mode
retrains only those (train_fails_from_all_euler.py equivalent).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from experiments.hyperparameters import PRESETS  # noqa: E402


def list_scenes(data_root: str):
    return sorted(
        d for d in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, d))
    )


def scene_done(log_root: str, scene: str) -> bool:
    return os.path.isfile(os.path.join(log_root, scene, "results.csv"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=list(PRESETS))
    p.add_argument("--data_root", required=True)
    p.add_argument("--log_root", required=True)
    p.add_argument("--method", default="ours", choices=["ours", "baseline"])
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--scenes", nargs="*", default=None,
                   help="subset of scene dirs (default: all)")
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--host_id", type=int, default=0)
    p.add_argument("--rerun_failed", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--extra", nargs="*", default=[],
                   help="extra flags forwarded to train_nerf.py")
    args = p.parse_args()

    scenes = args.scenes or list_scenes(args.data_root)
    scenes = scenes[args.host_id::args.num_hosts]
    preset = PRESETS[args.dataset](ours=args.method == "ours",
                                   epochs=args.epochs)

    failed = []
    for scene in scenes:
        if args.rerun_failed and scene_done(args.log_root, scene):
            continue
        cmd = [
            sys.executable, "train_nerf.py",
            f"--data_root_dir={os.path.join(args.data_root, scene)}",
            f"--log_root_dir={args.log_root}",
            f"--exp_name={scene}",
        ] + preset + list(args.extra)
        print("[sweep]", " ".join(cmd), flush=True)
        if args.dry_run:
            continue
        rc = subprocess.call(cmd)
        if rc != 0 or not scene_done(args.log_root, scene):
            failed.append(scene)
            print(f"[sweep] FAILED: {scene} (rc={rc})", flush=True)

    print(f"[sweep] done: {len(scenes) - len(failed)} ok, "
          f"{len(failed)} failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
