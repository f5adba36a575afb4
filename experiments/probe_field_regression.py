#!/usr/bin/env python
"""Supervised regression of the analytic wall texture c(x) through the
full NGPMT field (Lambertian) — no volume rendering. Isolates
encode+MLP+optimizer capacity from the march/composite training path."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
from normal_clustering_nerf_tpu.datasets.synthetic import _WALL_COLORS, _WALLS

ROOM = 0.4
LAYOUT = os.environ.get("LAYOUT", "brick")


def wall_color(p):
    a = np.abs(p)
    ax = np.argmax(a, -1)
    sgn = np.take_along_axis(np.sign(p), ax[..., None], -1)[..., 0]
    wall_id = np.zeros(p.shape[:-1], np.int64)
    for w, (axis, s) in enumerate(_WALLS):
        wall_id = np.where((ax == axis) & (sgn == s), w, wall_id)
    rgb = _WALL_COLORS[wall_id]
    tex = (np.sin(2 * np.pi * 4 * p[..., 0])
           + np.sin(2 * np.pi * 4 * p[..., 1] + 0.7)
           + np.sin(2 * np.pi * 4 * p[..., 2] + 1.9)) / 3.0
    return (rgb * (0.675 + 0.325 * tex[..., None])).astype(np.float32)


def sample_wall_points(rng, n):
    """Uniform points on the 6 inner wall faces."""
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-ROOM, ROOM, (n, 2)).astype(np.float32)
    p = np.zeros((n, 3), np.float32)
    for w, (axis, s) in enumerate(_WALLS):
        m = face == w
        other = [a for a in range(3) if a != axis]
        p[m, axis] = s * ROOM
        p[m, other[0]] = uv[m, 0]
        p[m, other[1]] = uv[m, 1]
    return p


def main():
    mcfg = ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                       hash_layout=LAYOUT, rgb_use_dir=False)
    model = NGPMT(mcfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2, eps=1e-15)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            out = model(p, x, jnp.ones_like(x))
            return jnp.mean((out["rgbs"] - y) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        params = optax.apply_updates(params, u)
        return params, opt, l

    rng = np.random.default_rng(0)
    for it in range(1001):
        x = sample_wall_points(rng, 8192)
        y = wall_color(x)
        params, opt, l = step(params, opt, jnp.asarray(x), jnp.asarray(y))
        if it % 200 == 0:
            print(f"it {it}: mse={float(l):.6f} "
                  f"psnr={-10 * np.log10(max(float(l), 1e-12)):.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
