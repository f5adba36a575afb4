#!/usr/bin/env python
"""Paper-figure generators over aggregated sweep results.

Reference-equivalent of the five figure scripts
(reference: experiments/draw_plots/{loss_w,cluster_tresh,
rotation_offset,triangle_size,improvement_wrt_difficulty}.py), driven
by the merged-results CSVs produced by extract_results.py instead of
hard-coded personal paths. Each subcommand reproduces the reference
figure layout (same axes, log scales, baseline dashed line) and
overlays the PUBLISHED reference numbers (the constants hard-coded in
the reference scripts) so a sweep of this framework can be compared
against the paper at a glance.

Subcommands:
  loss_w IN.csv          PSNR + rotation-angle errors vs clustering
                         loss weight (reference loss_w.py)
  cluster_tresh IN.csv   ... vs cluster threshold t (cluster_tresh.py)
  rotation_offset IN.csv ... vs scene rotation offset (rotation_offset.py)
  triangle_size IN.csv   ... vs triangle size (triangle_size.py)
  improvement IN.csv...  improvement-vs-difficulty scatter over dataset
                         batches (improvement_wrt_difficulty.py); with
                         no CSVs it renders the published numbers alone
  sweep IN.csv           generic metric-vs-column plot (legacy mode)

Each IN.csv is a merged multi-batch CSV (extract_results.py --out) with
param/... and metric/... columns.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

# Published reference results (reference:
# experiments/draw_plots/improvement_wrt_difficulty.py:40-72); baseline
# PSNR 25.86 also at loss_w.py:60, cluster_tresh.py:54,
# rotation_offset.py:43, triangle_size.py:54.
PUBLISHED_BASELINE_PSNR = 25.86
PUBLISHED_DATASETS = {
    "ScanNet": (17.78, 20.79),
    "Hypersim-A": (25.86, 27.20),
    "Hypersim-B": (20.75, 22.45),
    "Hypersim-C": (17.79, 19.43),
    "Replica": (34.30, 35.13),
    "Hypersim-A-12": (18.02, 20.50),
    "Hypersim-A-9": (16.79, 19.14),
    "Hypersim-A-6": (15.75, 16.67),
}

_ANGLE_COLS = {
    "yaw": ("metric/ang/clust/yaw_abs", "y", "o"),
    "pitch": ("metric/ang/clust/pitch_abs", "c", "x"),
    "roll": ("metric/ang/clust/roll_abs", "g", "s"),
}


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _find_col(df, *candidates):
    for c in candidates:
        if c in df.columns:
            return c
    raise SystemExit(
        f"none of {candidates} in CSV columns: {list(df.columns)[:20]}...")


def _sweep_pair(df, x_col, out_prefix, x_label, log_x, x_lim,
                psnr_ylim=(None, None)):
    """The reference's two-figure pattern: PSNR-vs-x with the published
    baseline dashed line, and yaw/pitch/roll angle errors vs x."""
    plt = _plt()
    d = df.sort_values(by=x_col)
    x = d[x_col].values

    fig, ax = plt.subplots(figsize=(9, 3))
    psnr_col = _find_col(d, "metric/psnr", "metric/rgb/psnr")
    ax.plot(x, d[psnr_col].values, color="b", marker="^", markersize=7,
            label="Ours")
    ax.plot(x_lim, [PUBLISHED_BASELINE_PSNR] * 2, color="red", ls="dashed",
            label="Baseline (published)")
    if log_x:
        ax.set_xscale("log")
    ax.set_xlim(x_lim)
    if psnr_ylim[0] is not None:
        ax.set_ylim(psnr_ylim)
    ax.set_xlabel(x_label)
    ax.set_ylabel("PSNR [dB] $\\uparrow$")
    ax.grid(True)
    ax.legend()
    fig.tight_layout()
    p1 = f"{out_prefix}_psnr.png"
    fig.savefig(p1, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {p1}")

    fig, ax = plt.subplots(figsize=(9, 3))
    any_angle = False
    for name, (col, color, marker) in _ANGLE_COLS.items():
        if col in d.columns:
            ax.plot(x, d[col].values, color=color, marker=marker,
                    markersize=7, label=name.capitalize())
            any_angle = True
    if any_angle:
        if log_x:
            ax.set_xscale("log")
        ax.set_xlim(x_lim)
        ax.set_xlabel(x_label)
        ax.set_ylabel("$L_1$ error $[^{\\circ}]$ $\\downarrow$")
        ax.grid(True)
        ax.legend()
        fig.tight_layout()
        p2 = f"{out_prefix}_angles.png"
        fig.savefig(p2, dpi=200, bbox_inches="tight")
        print(f"wrote {p2}")
    plt.close(fig)


def cmd_loss_w(args):
    df = pd.read_csv(args.csv)
    x = _find_col(df, "param/loss.norm_D_C_ort_dot_w",
                  "param/loss_norm_D_C_ort_dot_w")
    _sweep_pair(df, x, args.out_prefix or "loss_w",
                "Loss weight $\\lambda_{ort}=\\lambda_{ctr}$ (log scale)",
                log_x=True, x_lim=(1e-5, 5e-1), psnr_ylim=(20.0, 28.5))


def cmd_cluster_tresh(args):
    df = pd.read_csv(args.csv)
    x = _find_col(df, "param/loss.norm_can_tres", "param/loss_norm_can_tres")
    _sweep_pair(df, x, args.out_prefix or "cluster_tresh",
                "Cluster threshold $t$ (log scale)",
                log_x=True, x_lim=(0.002, 0.55), psnr_ylim=(24.5, 28.5))


def cmd_rotation_offset(args):
    df = pd.read_csv(args.csv)
    x = _find_col(df, "param/loss.norm_yaw_offset_ang",
                  "param/loss_norm_yaw_offset_ang")
    _sweep_pair(df, x, args.out_prefix or "rotation_offset",
                "Rotation offset $\\alpha [^{\\circ}]$",
                log_x=False, x_lim=(-1.0, 31.0), psnr_ylim=(24.5, 28.5))


def cmd_triangle_size(args):
    df = pd.read_csv(args.csv)
    x = _find_col(df, "param/data.triang_max_expand",
                  "param/data_triang_max_expand")
    _sweep_pair(df, x, args.out_prefix or "triangle_size",
                "Triangle size", log_x=False, x_lim=(-1.0, 11.0),
                psnr_ylim=(24.5, 28.5))


def cmd_improvement(args):
    """Relative PSNR improvement vs scene difficulty
    (reference: improvement_wrt_difficulty.py). Each input CSV is one
    (baseline, ours) batch pair named via --names; with none given,
    renders the published reference numbers alone."""
    plt = _plt()
    names, base, ours = [], [], []
    for name, (b, o) in PUBLISHED_DATASETS.items():
        names.append(name + " (published)")
        base.append(b)
        ours.append(o)
    for i, csv in enumerate(args.csv or []):
        df = pd.read_csv(csv)
        psnr_col = _find_col(df, "metric/psnr", "metric/rgb/psnr")
        if "exp_name" in df.columns and args.baseline_exp:
            b = df[df["exp_name"] == args.baseline_exp][psnr_col].mean()
            o = df[df["exp_name"] != args.baseline_exp][psnr_col].mean()
        else:
            b, o = df[psnr_col].min(), df[psnr_col].max()
        names.append((args.names[i] if args.names and i < len(args.names)
                      else os.path.basename(csv)))
        base.append(float(b))
        ours.append(float(o))

    base = np.asarray(base)
    ours = np.asarray(ours)
    impr = (ours / base - 1.0) * 100.0
    order = np.argsort(base)

    fig, ax = plt.subplots(figsize=(9, 3))
    pub = np.array(["published" in n for n in names])[order]
    ax.plot(base[order][pub], impr[order][pub], color="b", marker="^",
            markersize=7, label="Published (reference)")
    if (~pub).any():
        ax.plot(base[order][~pub], impr[order][~pub], color="g", marker="o",
                markersize=7, ls="", label="This framework")
    for n, x, y in zip(np.asarray(names)[order], base[order], impr[order]):
        ax.annotate(n.replace(" (published)", ""), (x, y), fontsize=7,
                    xytext=(2, 4), textcoords="offset points")
    ax.set_xlim(16.0, 37.0)
    ax.set_ylim(0.0, 21.0)
    ax.set_xlabel("Baseline PSNR [dB] (scene difficulty $\\rightarrow$ easier)")
    ax.set_ylabel("PSNR improvement [%]")
    ax.grid(True)
    ax.legend()
    fig.tight_layout()
    out = args.out_prefix or "improvement"
    fig.savefig(f"{out}.png", dpi=200, bbox_inches="tight")
    print(f"wrote {out}.png")


def cmd_sweep(args):
    df = pd.read_csv(args.csv)
    baseline = None
    if args.baseline_exp is not None and "exp_name" in df.columns:
        b = df[df["exp_name"] == args.baseline_exp]
        if not b.empty:
            baseline = float(b[args.metric].iloc[0])
        df = df[df["exp_name"] != args.baseline_exp]
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 3.4))
    d = df.sort_values(by=args.x)
    ax.plot(d[args.x], d[args.metric], "o-", label="ours")
    if baseline is not None:
        ax.axhline(baseline, color="gray", ls="--", label="baseline NGP")
    if args.log_x:
        ax.set_xscale("log")
    ax.set_xlabel(args.x.split("/")[-1])
    ax.set_ylabel(args.metric.replace("metric/", ""))
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=160)
    print(f"wrote {args.out}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("loss_w", cmd_loss_w),
                     ("cluster_tresh", cmd_cluster_tresh),
                     ("rotation_offset", cmd_rotation_offset),
                     ("triangle_size", cmd_triangle_size)):
        sp = sub.add_parser(name)
        sp.add_argument("csv")
        sp.add_argument("--out_prefix", default=None)
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("improvement")
    sp.add_argument("csv", nargs="*")
    sp.add_argument("--names", nargs="*", default=None)
    sp.add_argument("--baseline_exp", default=None)
    sp.add_argument("--out_prefix", default=None)
    sp.set_defaults(fn=cmd_improvement)
    sp = sub.add_parser("sweep")
    sp.add_argument("csv")
    sp.add_argument("--x", required=True)
    sp.add_argument("--metric", default="metric/psnr")
    sp.add_argument("--baseline_exp", default=None)
    sp.add_argument("--out", default="sweep.png")
    sp.add_argument("--log_x", action="store_true")
    sp.set_defaults(fn=cmd_sweep)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
