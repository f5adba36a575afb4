"""The five paper-figure generators must produce their PNGs from
synthetic sweep CSVs (reference figures:
experiments/draw_plots/*.py)."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

pytest.importorskip("matplotlib")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "experiments", "draw_plots.py")


def _sweep_csv(path, x_col, x_vals):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        x_col: x_vals,
        "metric/psnr": 26.0 + rng.normal(0, 0.5, len(x_vals)),
        "metric/ang/clust/yaw_abs": rng.uniform(0.5, 3, len(x_vals)),
        "metric/ang/clust/pitch_abs": rng.uniform(0.5, 3, len(x_vals)),
        "metric/ang/clust/roll_abs": rng.uniform(0.5, 3, len(x_vals)),
    })
    df.to_csv(path, index=False)


def _run(args, cwd):
    r = subprocess.run([sys.executable, SCRIPT] + args, cwd=cwd,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr


@pytest.mark.parametrize("cmd,x_col,x_vals", [
    ("loss_w", "param/loss.norm_D_C_ort_dot_w",
     [1e-4, 1e-3, 1e-2, 1e-1]),
    ("cluster_tresh", "param/loss.norm_can_tres", [0.01, 0.1, 0.3, 0.5]),
    ("rotation_offset", "param/loss.norm_yaw_offset_ang", [0, 10, 20, 30]),
    ("triangle_size", "param/data.triang_max_expand", [0, 2, 5, 10]),
])
def test_sweep_figures(tmp_path, cmd, x_col, x_vals):
    csv = tmp_path / "sweep.csv"
    _sweep_csv(csv, x_col, x_vals)
    _run([cmd, str(csv), "--out_prefix", str(tmp_path / cmd)], str(tmp_path))
    assert (tmp_path / f"{cmd}_psnr.png").exists()
    assert (tmp_path / f"{cmd}_angles.png").exists()


def test_improvement_figure(tmp_path):
    csv = tmp_path / "batch.csv"
    pd.DataFrame({
        "exp_name": ["base", "ours"],
        "metric/psnr": [20.0, 22.0],
    }).to_csv(csv, index=False)
    _run(["improvement", str(csv), "--baseline_exp", "base",
          "--names", "synthetic-room",
          "--out_prefix", str(tmp_path / "improvement")], str(tmp_path))
    assert (tmp_path / "improvement.png").exists()


def test_improvement_published_only(tmp_path):
    _run(["improvement", "--out_prefix", str(tmp_path / "pub")], str(tmp_path))
    assert (tmp_path / "pub.png").exists()
