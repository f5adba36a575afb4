"""NGP-MT: Instant-NGP hash field with multi-task heads, functional JAX.

TPU-native re-design of the reference NGPMT module
(reference: models/ngp_mt.py:10-229). The reference composes
tiny-cuda-nn fused-CUDA blocks; here the field is a pure function of an
explicit parameter pytree — hash table + bias-free MLP stacks (tcnn's
FullyFusedMLPs are bias-free) — whose matmuls XLA fuses onto the MXU.

Architecture (identical to the reference):
  * xyz hash encoding: L=16, F=2, T=2^19, N_min=16,
    b = exp(ln(2048*scale/16)/15)               (ngp_mt.py:40-41)
  * sigma_net: 32 -> 64 -> 16, 1 hidden, ReLU    (ngp_mt.py:83-92);
    sigma = trunc_exp(h[:, 0])                   (ngp_mt.py:169)
  * rgb_net: [d, h] (3+16=19) -> 64 -> 64 -> 3, sigmoid
    (ngp_mt.py:103-113; the SH dir encoder is instantiated but
    bypassed, ngp_mt.py:207-209 — same here, see sh_encoding.py)
  * sem_net: 16 -> 64 -> 64 -> n_cls             (ngp_mt.py:116-127)
  * norm_net: 16 -> 64 -> 64 -> 3                (ngp_mt.py:129-140)
  * tonemapper_net_{0,1,2}: 1 -> 64 -> 1, sigmoid, when rgb_act='None'
    (HDR / use_exposure setting, ngp_mt.py:142-155, 173-194)
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.trunc_exp import trunc_exp, trunc_sigmoid
from .brick_hash import BrickGridSpec, brick_encode, init_brick_table
from .hash_encoding import HashGridSpec, hash_encode, init_hash_table
from .triplane import TriplaneSpec, init_triplane, triplane_encode

Params = Dict[str, Any]


def _init_mlp(key, dims, dtype=jnp.float32):
    """Bias-free MLP params, Xavier-uniform (tcnn FullyFusedMLP style)."""
    ws = {}
    keys = jax.random.split(key, len(dims) - 1)
    for i, (fan_in, fan_out) in enumerate(zip(dims[:-1], dims[1:])):
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        ws[f"w{i}"] = jax.random.uniform(
            keys[i], (fan_in, fan_out), dtype=dtype, minval=-bound, maxval=bound
        )
    return ws


def _apply_mlp(params, x, out_act=None, compute_dtype=jnp.float32):
    h = x.astype(compute_dtype)
    n = len(params)
    for i in range(n):
        w = params[f"w{i}"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=compute_dtype)
        if i < n - 1:
            h = jax.nn.relu(h)
    if out_act == "sigmoid":
        # gradient-clamped backward: a saturated color head can recover
        # (see ops/trunc_exp.py trunc_sigmoid)
        h = trunc_sigmoid(h)
    return h


class NGPMT:
    """Stateless model: holds static config, operates on param pytrees."""

    def __init__(self, cfg: ModelConfig, need_pos_grad: bool = False):
        self.cfg = cfg
        self.scale = cfg.scale
        self.grid_size = cfg.grid_size
        self.cascades = cfg.cascades
        # propagate position gradients through the hash encoding only
        # when camera extrinsics are optimized (see hash_encoding.py)
        self.need_pos_grad = need_pos_grad
        self.rgb_act = "None" if cfg.use_exposure else "Sigmoid"
        if cfg.hash_layout == "brick":
            self.grid_spec = BrickGridSpec.create(
                n_levels=cfg.n_levels,
                n_features=cfg.n_features_per_level,
                log2_bricks=cfg.log2_bricks,
                base_res=cfg.base_resolution,
                per_level_scale=cfg.per_level_scale,
            )
        elif cfg.hash_layout == "triplane":
            self.grid_spec = TriplaneSpec.create(
                plane_res=cfg.plane_res, plane_feats=cfg.plane_feats,
                grid3d_res=cfg.grid3d_res, grid3d_feats=cfg.grid3d_feats,
            )
        else:
            self.grid_spec = HashGridSpec.create(
                n_levels=cfg.n_levels,
                n_features=cfg.n_features_per_level,
                log2_table_size=cfg.log2_hashmap_size,
                base_res=cfg.base_resolution,
                per_level_scale=cfg.per_level_scale,
            )
        self.compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.enc_dim = (self.grid_spec.out_dim
                        if cfg.hash_layout == "triplane"
                        else cfg.n_levels * cfg.n_features_per_level)

    # ------------------------------------------------------------ init
    def init(self, key) -> Params:
        cfg = self.cfg
        ks = jax.random.split(key, 8)
        enc_dim = self.enc_dim
        geo = cfg.geo_feat_dim
        W = cfg.hidden_dim
        init_table = {
            "brick": init_brick_table,
            "triplane": init_triplane,
        }.get(cfg.hash_layout, init_hash_table)
        params: Params = {
            "hash_table": init_table(ks[0], self.grid_spec),
            "sigma_net": _init_mlp(
                ks[1], [enc_dim] + [W] * cfg.sigma_hidden_layers + [geo]
            ),
            "rgb_net": _init_mlp(
                ks[2], [3 + geo] + [W] * cfg.rgb_hidden_layers + [3]
            ),
        }
        if cfg.pred_sem:
            params["sem_net"] = _init_mlp(
                ks[3], [geo] + [W] * cfg.head_hidden_layers + [cfg.n_sem_cls]
            )
        if cfg.pred_norm_nn:
            params["norm_net"] = _init_mlp(
                ks[4], [geo] + [W] * cfg.head_hidden_layers + [3]
            )
        if self.rgb_act == "None":
            for i in range(3):
                params[f"tonemapper_net_{i}"] = _init_mlp(ks[5 + i], [1, W, 1])
        return params

    # --------------------------------------------------------- density
    def density(self, params: Params, x, return_feat: bool = False):
        """sigma at world positions x in [-scale, scale]^3
        (reference: models/ngp_mt.py:157-171)."""
        xn = (x + self.scale) / (2.0 * self.scale)  # -> [0, 1]^3
        encode = {
            "brick": brick_encode,
            "triplane": triplane_encode,
        }.get(self.cfg.hash_layout, hash_encode)
        enc = encode(
            params["hash_table"], xn, self.grid_spec, self.compute_dtype,
            need_dx=self.need_pos_grad,
        )
        h = _apply_mlp(params["sigma_net"], enc, compute_dtype=self.compute_dtype)
        sigmas = trunc_exp(h[:, 0].astype(jnp.float32))
        if return_feat:
            return sigmas, h
        return sigmas

    def log_radiance_to_rgb(self, params: Params, log_radiances, exposure=None):
        """HDR-NeRF tonemapping (reference: models/ngp_mt.py:173-194)."""
        log_exposure = jnp.log(exposure) if exposure is not None else 0.0
        outs = []
        for i in range(3):
            inp = log_radiances[:, i:i + 1] + log_exposure
            outs.append(
                _apply_mlp(
                    params[f"tonemapper_net_{i}"], inp, out_act="sigmoid",
                    compute_dtype=self.compute_dtype,
                )
            )
        return jnp.concatenate(outs, axis=1)

    # --------------------------------------------------------- forward
    def __call__(
        self,
        params: Params,
        x,
        d,
        exposure: Optional[jnp.ndarray] = None,
        output_radiance: bool = False,
    ):
        """Full field eval (reference: models/ngp_mt.py:196-229).

        Args:
          x: (M, 3) positions in [-scale, scale]^3.
          d: (M, 3) view directions (normalized inside, ngp_mt.py:207).
        Returns dict: sigmas (M,), rgbs (M, 3) [+ sems, norms].
        """
        sigmas, h = self.density(params, x, return_feat=True)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        if not self.cfg.rgb_use_dir:
            d = d * 0.0   # Lambertian mode (see ModelConfig.rgb_use_dir)
        rgb_in = jnp.concatenate([d.astype(h.dtype), h], axis=1)
        rgbs = _apply_mlp(
            params["rgb_net"], rgb_in,
            out_act="sigmoid" if self.rgb_act == "Sigmoid" else None,
            compute_dtype=self.compute_dtype,
        )
        if self.rgb_act == "None":
            if output_radiance:
                rgbs = trunc_exp(rgbs.astype(jnp.float32))
            else:
                rgbs = self.log_radiance_to_rgb(params, rgbs, exposure)

        out = {"sigmas": sigmas, "rgbs": rgbs.astype(jnp.float32)}
        if self.cfg.pred_sem:
            out["sems"] = _apply_mlp(
                params["sem_net"], h, compute_dtype=self.compute_dtype
            ).astype(jnp.float32)
        if self.cfg.pred_norm_nn:
            out["norms"] = _apply_mlp(
                params["norm_net"], h, compute_dtype=self.compute_dtype
            ).astype(jnp.float32)
        return out
