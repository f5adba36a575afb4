"""Native JAX LPIPS (VGG-16 variant).

TPU-native implementation of the Learned Perceptual Image Patch
Similarity metric the reference computes through torchmetrics
(reference: metrics/rgb_metrics.py:124-162). The computation graph
follows the official `lpips` package (richzhang/PerceptualSimilarity,
v0.1 'vgg' net) exactly:

  1. scale inputs from [0, 1] to [-1, 1];
  2. per-channel affine normalisation
     (x - shift) / scale  with the package's constants;
  3. VGG-16 feature maps after relu1_2, relu2_2, relu3_3, relu4_3,
     relu5_3 (maxpool 2x2 between blocks);
  4. unit-normalise each feature map over channels;
  5. squared difference, 1x1 non-negative linear head per layer,
     spatial mean, sum over layers.

Weights: this environment has no pretrained VGG checkpoint and no
network egress, so weights load from an .npz produced once by
`experiments/convert_lpips_weights.py` (torch `lpips` checkpoint ->
npz). The computation graph itself is parity-tested against a
from-scratch torch implementation with shared random weights
(tests/test_lpips.py), so the only trust needed in the npz is the
conversion of tensor layouts.

Weight file resolution order:
  1. explicit `weights` argument,
  2. $NCNERF_LPIPS_WEIGHTS,
  3. <repo>/weights/lpips_vgg.npz.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips package scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG-16 conv plan: (name, out_channels); 'M' = 2x2/2 maxpool.
# Taps (the lpips feature layers) come after the relu of the marked convs.
_VGG_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")
_LIN_CHANNELS = (64, 128, 256, 512, 512)


def _conv(x, w, b):
    """3x3 same-padding conv, NHWC x HWIO."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b[None, None, None, :]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_features(params: Dict[str, jnp.ndarray], x):
    """Feature maps at the five LPIPS tap points.

    Args:
      params: {'<conv>_w': (3,3,in,out), '<conv>_b': (out,)}.
      x: (N, H, W, 3) in [-1, 1] AFTER lpips input scaling.
    Returns: list of five (N, h, w, c) arrays.
    """
    h = (x - _SHIFT) / _SCALE
    feats = []
    for item in _VGG_PLAN:
        if item == "M":
            h = _maxpool(h)
            continue
        name, _ = item
        h = jax.nn.relu(_conv(h, params[f"{name}_w"], params[f"{name}_b"]))
        if name in _TAPS:
            feats.append(h)
    return feats


def _unit_normalize(f, eps=1e-10):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


@partial(jax.jit, static_argnums=())
def _lpips_pair(params, lins, a, b):
    fa = vgg16_features(params, a)
    fb = vgg16_features(params, b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(x) - _unit_normalize(y)) ** 2
        # 1x1 non-negative linear head == channel-weighted sum
        w = lins[i]                                     # (C,)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


class LPIPS:
    """Callable LPIPS metric. Images are (H, W, 3) float in [0, 1]."""

    def __init__(self, params: Dict[str, np.ndarray],
                 lins: Optional[list] = None):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        if lins is None:
            lins = [params[f"lin{i}"] for i in range(5)]
        self.lins = [jnp.asarray(np.asarray(l).reshape(-1)) for l in lins]
        for i, l in enumerate(self.lins):
            if l.shape[0] != _LIN_CHANNELS[i]:
                raise ValueError(
                    f"lin{i} has {l.shape[0]} channels, expected "
                    f"{_LIN_CHANNELS[i]}")

    def __call__(self, img0, img1) -> float:
        a = jnp.asarray(img0, jnp.float32)[None] * 2.0 - 1.0
        b = jnp.asarray(img1, jnp.float32)[None] * 2.0 - 1.0
        return float(_lpips_pair(self.params, self.lins, a, b)[0])


def default_weights_path() -> str:
    env = os.environ.get("NCNERF_LPIPS_WEIGHTS")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, "weights", "lpips_vgg.npz")


def load_lpips(weights: Optional[str] = None) -> Optional[LPIPS]:
    """LPIPS instance from an npz weight file, or None if unavailable."""
    path = weights or default_weights_path()
    if not os.path.exists(path):
        return None
    data = np.load(path)
    params = {k: data[k] for k in data.files if not k.startswith("lin")}
    lins = [data[f"lin{i}"] for i in range(5)]
    return LPIPS(params, lins)


def random_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random VGG+lin weights (for graph parity tests only)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {}
    cin = 3
    for item in _VGG_PLAN:
        if item == "M":
            continue
        name, cout = item
        params[f"{name}_w"] = rng.standard_normal(
            (3, 3, cin, cout)).astype(np.float32) * (1.0 / np.sqrt(9 * cin))
        params[f"{name}_b"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        cin = cout
    for i, c in enumerate(_LIN_CHANNELS):
        params[f"lin{i}"] = rng.uniform(0, 1, c).astype(np.float32)
    return params
