#!/usr/bin/env python
"""Batch-results aggregation over per-scene results.csv files.

Reference-equivalent of the extract_results pipeline (reference:
experiments/extract_results/utils_results.py:20 load_all_res_batch,
:111 reduce_one_batch, :145-199 reduce/merge): walk a batch directory,
collect per-run results.csv rows, dedupe scenes, drop blacklisted
degenerate scenes, mean/median-reduce metric columns, and merge several
method batches into one comparison table keeping only metrics present.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import pandas as pd

# reference: utils_results.py:7-16
BLACKLISTED_SCENES = [
    "ai_003_001",   # completely black scene
    "ai_026_008",   # cameras all looking at a far ceiling
    "office_1", "office_4", "office_0",   # replica
    "0084_00",      # scannet
]
SCENE_RES_FNAME = "results.csv"
SCENE_COL = "info/scene"


def load_all_res_batch(batch_root: str) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Collect per-scene rows; a run dir without results.csv is a
    failure (utils_results.py:44-57)."""
    rows, failed, seen = [], [], set()
    for exp_n in sorted(os.listdir(batch_root)):
        exp_dir = os.path.join(batch_root, exp_n)
        if not os.path.isdir(exp_dir):
            continue
        res_path = os.path.join(exp_dir, SCENE_RES_FNAME)
        if not os.path.isfile(res_path):
            failed.append(exp_n)
            continue
        df = pd.read_csv(res_path)
        scene = (df[SCENE_COL].item() if SCENE_COL in df else exp_n)
        if scene in seen:
            continue
        seen.add(scene)
        df[SCENE_COL] = scene
        rows.append(df)
    res_all = pd.concat(rows) if rows else pd.DataFrame()
    if not res_all.empty:
        res_all = res_all[~res_all[SCENE_COL].isin(BLACKLISTED_SCENES)]
        res_all = res_all.sort_values(by=[SCENE_COL])
    failed_all = pd.DataFrame({"exp_name": sorted(failed)})
    return res_all, failed_all


def reduce_one_batch(res_all: pd.DataFrame, reduction: str = "mean"
                     ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Mean/median over scenes of the metric/ columns; keep
    consistent param/info columns (utils_results.py:111-143)."""
    metric_cols = [c for c in res_all if c.startswith("metric/")]
    other_cols = [c for c in res_all
                  if c.startswith("param/") or c.startswith("info/")]
    metrics = res_all[metric_cols]
    reduced = metrics.mean(axis=0) if reduction == "mean" else metrics.median(axis=0)
    reduced = pd.DataFrame(data=[reduced.values], columns=reduced.index)
    consistent = {
        c: res_all[c].iloc[0]
        for c in other_cols if res_all[c].nunique(dropna=False) == 1
    }
    return reduced, pd.DataFrame([consistent])


def keep_overlapping_scenes(batches: Dict[str, pd.DataFrame]) -> Dict[str, pd.DataFrame]:
    """Restrict every batch to scenes present in all batches so method
    comparisons are apples-to-apples."""
    common = None
    for df in batches.values():
        s = set(df[SCENE_COL])
        common = s if common is None else common & s
    return {k: df[df[SCENE_COL].isin(common)] for k, df in batches.items()}


def merge_averaged_batches(batches: Dict[str, pd.DataFrame],
                           reduction: str = "mean",
                           overlap_only: bool = True) -> pd.DataFrame:
    """One row per method batch with reduced metrics
    (utils_results.py:162-199)."""
    if overlap_only and len(batches) > 1:
        batches = keep_overlapping_scenes(batches)
    out_rows = []
    for name, df in batches.items():
        reduced, _ = reduce_one_batch(df, reduction)
        row = {"exp_name": name, "n_exp": df.shape[0]}
        row.update({c: reduced[c].item() for c in reduced.columns})
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("batch_roots", nargs="+",
                   help="one or more batch directories (one per method)")
    p.add_argument("--reduction", default="mean", choices=["mean", "median"])
    p.add_argument("--out", default=None, help="merged csv output path")
    args = p.parse_args()

    batches = {}
    for root in args.batch_roots:
        res, failed = load_all_res_batch(root.rstrip(os.sep))
        name = os.path.basename(root.rstrip(os.sep))
        print(f"{name}: {res.shape[0]} ok, {failed.shape[0]} failed")
        if not res.empty:
            batches[name] = res
    merged = merge_averaged_batches(batches, args.reduction)
    print(merged.to_string(index=False))
    if args.out:
        merged.to_csv(args.out, float_format="%.6f", index=False)


if __name__ == "__main__":
    main()
