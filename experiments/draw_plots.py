#!/usr/bin/env python
"""Ablation/comparison figures from aggregated sweep results.

Reference-equivalent of the paper-figure layer (reference:
experiments/draw_plots/{loss_w,cluster_tresh,rotation_offset,
triangle_size,improvement_wrt_difficulty}.py) — but driven by the
merged-results CSVs produced by extract_results.py rather than
hard-coded numbers: each subcommand plots a metric against a swept
hyper-parameter across method batches, with the baseline batch drawn
as a horizontal reference line.
"""
from __future__ import annotations

import argparse
import os

import pandas as pd


def _plot_sweep(df, x_col, metric, baseline_value, out_path, x_label,
                log_x=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 3.4))
    d = df.sort_values(by=x_col)
    ax.plot(d[x_col], d[metric], "o-", label="ours")
    if baseline_value is not None:
        ax.axhline(baseline_value, color="gray", ls="--", label="baseline NGP")
    if log_x:
        ax.set_xscale("log")
    ax.set_xlabel(x_label)
    ax.set_ylabel(metric.replace("metric/", ""))
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=160)
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("merged_csv", help="output of extract_results.py --out")
    p.add_argument("--x", required=True,
                   help="swept column, e.g. param/loss.norm_D_C_ort_dot_w "
                        "or param/loss.norm_can_tres")
    p.add_argument("--metric", default="metric/psnr")
    p.add_argument("--baseline_exp", default=None,
                   help="exp_name of the baseline batch (drawn as hline)")
    p.add_argument("--out", default="sweep.png")
    p.add_argument("--log_x", action="store_true")
    args = p.parse_args()

    df = pd.read_csv(args.merged_csv)
    baseline = None
    if args.baseline_exp is not None:
        b = df[df["exp_name"] == args.baseline_exp]
        if not b.empty:
            baseline = float(b[args.metric].iloc[0])
        df = df[df["exp_name"] != args.baseline_exp]
    _plot_sweep(df, args.x, args.metric, baseline, args.out,
                args.x.split("/")[-1], args.log_x)


if __name__ == "__main__":
    main()
