"""LPIPS graph parity: the native JAX implementation must reproduce the
official lpips-package computation graph exactly. Pretrained weights
are unavailable in this image, so parity is proven with SHARED RANDOM
weights against a from-scratch torch implementation of the same graph
(richzhang/PerceptualSimilarity lpips.py, vgg variant) — layout
conversion is then the only thing the npz loader has to get right.
"""
import numpy as np
import pytest

from normal_clustering_nerf_tpu.metrics.lpips import (
    LPIPS, _SCALE, _SHIFT, _TAPS, _VGG_PLAN, load_lpips, random_weights,
)

torch = pytest.importorskip("torch")


def _torch_lpips(params, img0, img1):
    import torch.nn.functional as F

    def feats(img):
        # lpips input scaling: [0,1] -> [-1,1] -> affine normalise
        x = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
        x = x * 2 - 1
        x = (x - torch.tensor(_SHIFT, dtype=torch.float32).view(1, 3, 1, 1)) \
            / torch.tensor(_SCALE, dtype=torch.float32).view(1, 3, 1, 1)
        out = []
        h = x
        for item in _VGG_PLAN:
            if item == "M":
                h = F.max_pool2d(h, 2, 2)
                continue
            name, _ = item
            w = torch.from_numpy(
                np.transpose(params[f"{name}_w"], (3, 2, 0, 1)).copy())
            b = torch.from_numpy(params[f"{name}_b"])
            h = F.relu(F.conv2d(h.float(), w.float(), b.float(), padding=1))
            if name in _TAPS:
                out.append(h)
        return out

    fa, fb = feats(img0), feats(img1)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        x = x.float(); y = y.float()
        xn = x / torch.sqrt((x * x).sum(1, keepdim=True) + 1e-10)
        yn = y / torch.sqrt((y * y).sum(1, keepdim=True) + 1e-10)
        d = (xn - yn) ** 2
        w = torch.from_numpy(params[f"lin{i}"]).view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean()
    return float(total)


def test_matches_torch_reference_graph():
    params = random_weights(0)
    rng = np.random.default_rng(1)
    img0 = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(
        np.float32)
    ours = LPIPS(params)(img0, img1)
    ref = _torch_lpips(params, img0, img1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_identity_and_monotonicity():
    params = random_weights(2)
    m = LPIPS(params)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert m(img, img) < 1e-6
    small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(np.float32)
    big = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1).astype(np.float32)
    assert m(img, small) < m(img, big)


def test_loader_roundtrip(tmp_path):
    params = random_weights(4)
    path = tmp_path / "lpips.npz"
    np.savez(path, **params)
    m = load_lpips(str(path))
    assert m is not None
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(m(a, b), LPIPS(params)(a, b), rtol=1e-6)


def test_lpips_column_lands_in_results_csv(tmp_path, monkeypatch):
    """e2e: with a weights npz present, eval_lpips=True produces the
    metric/lpips column in results.csv (the reference's results
    contract, rgb_metrics.py:124-162 + train_nerf.py:685-704)."""
    import csv

    from normal_clustering_nerf_tpu.config import TrainConfig
    from normal_clustering_nerf_tpu.metrics.metrics import NeRFMTMetricsPerIm
    from normal_clustering_nerf_tpu.training.results import save_results_csv

    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **random_weights(3))
    monkeypatch.setenv("NCNERF_LPIPS_WEIGHTS", str(path))

    agg = NeRFMTMetricsPerIm(eval_lpips=True)
    rng = np.random.default_rng(0)
    img = rng.random((40, 40, 3)).astype(np.float32)
    agg.update({"rgb": img}, {"rgb": np.clip(img + 0.05, 0, 1)})
    out = agg.compute()
    assert "lpips" in out and np.isfinite(out["lpips"])

    csv_path = save_results_csv(str(tmp_path / "results.csv"), out,
                                TrainConfig())
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert "metric/lpips" in rows[0]
    assert np.isfinite(float(rows[0]["metric/lpips"]))
