#!/usr/bin/env python
"""Chained-dependency micro-profile (trustworthy on the axon tunnel).

The axon backend's block_until_ready does not actually block for
independent dispatches, so naive timeit loops under-report; and
tracing a jitted fn that CLOSES OVER a device array triggers a
device->host fetch that degrades the tunnel for the whole process.
This profiler therefore (a) chains every measured iteration through a
data dependency and (b) passes every device array as an argument.

Measured facts this encodes (v5e, 2026-08): XLA gather costs ~8 ns per
INDEX regardless of fetched row width (1 byte or 512 bytes alike);
matmuls and elementwise ops are effectively free next to gathers.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.brick_hash import (
    BrickGridSpec, brick_encode, init_brick_table,
)
from normal_clustering_nerf_tpu.models.occupancy import coarse_occupancy
from normal_clustering_nerf_tpu.ops.composite import composite_rays
from normal_clustering_nerf_tpu.ops.packbits import packbits
from normal_clustering_nerf_tpu.ops.ray_march import march_rays_train_dense


def chain(fn, x0, n=30, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    N, S, K, G = 8192, 1024, 32, 128
    mcfg = ModelConfig(scale=0.5, grid_size=G, max_samples=1024)
    rays_o = jnp.asarray(rng.uniform(-0.35, 0.35, (N, 3)).astype(np.float32))
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays_d = jnp.asarray(d)
    # realistic steady-state occupancy: a hollow room (walls occupied)
    occ = np.zeros((G, G, G), bool)
    occ[:6] = occ[-6:] = True
    occ[:, :6] = occ[:, -6:] = True
    occ[:, :, :6] = occ[:, :, -6:] = True
    flat = occ.transpose(2, 1, 0).reshape(-1)
    bitfield = packbits(jnp.asarray(flat.astype(np.float32)), 0.5)
    coarse = coarse_occupancy(bitfield, G)
    jax.block_until_ready(coarse)
    hits = jnp.stack([jnp.zeros(N), jnp.full((N,), 1.7)], axis=1)
    noise0 = jnp.asarray(rng.random(N).astype(np.float32))

    mkw = dict(cascades=1, scale=0.5, exp_step_factor=0.0, grid_size=G,
               max_samples=1024, samples_per_ray=K, march_steps=S)

    def march_exact(noise):
        mr = march_rays_train_dense(rays_o, rays_d, hits, bitfield, noise,
                                    **mkw)
        return (noise + jnp.sum(mr.t) * 1e-12) % 1.0
    print(f"march dense exact      {chain(jax.jit(march_exact), noise0):8.2f} ms",
          flush=True)

    def march_coarse(noise):
        mr = march_rays_train_dense(rays_o, rays_d, hits, bitfield, noise,
                                    coarse_occ=coarse, **mkw)
        return (noise + jnp.sum(mr.t) * 1e-12) % 1.0
    print(f"march dense coarse     {chain(jax.jit(march_coarse), noise0):8.2f} ms",
          flush=True)

    from normal_clustering_nerf_tpu.models.occupancy import supervoxel_tables
    from normal_clustering_nerf_tpu.ops.ray_march import (
        march_rays_train_dense_sv,
    )
    sv_m, sv_p = supervoxel_tables(bitfield, G)
    jax.block_until_ready(sv_p)

    def march_sv(noise):
        mr = march_rays_train_dense_sv(
            rays_o, rays_d, hits, sv_m, sv_p, noise,
            scale=0.5, grid_size=G, max_samples=1024, samples_per_ray=K,
            march_steps=S)
        return (noise + jnp.sum(mr.t) * 1e-12) % 1.0
    print(f"march dense sv-run     {chain(jax.jit(march_sv), noise0):8.2f} ms",
          flush=True)

    # triplane encode fwd / fwd+bwd
    from normal_clustering_nerf_tpu.models.triplane import (
        TriplaneSpec, init_triplane, triplane_encode,
    )
    tp_spec = TriplaneSpec.create()
    tp = init_triplane(jax.random.PRNGKey(2), tp_spec)
    xn_tp = jnp.asarray(rng.random((N * K, 3)).astype(np.float32))

    def tp_fwd(x):
        f = triplane_encode(tp, x, tp_spec)
        return (x + jnp.sum(f) * 1e-12) % 1.0
    print(f"triplane fwd           {chain(jax.jit(tp_fwd), xn_tp):8.2f} ms",
          flush=True)

    def tp_fwd_bwd(x):
        g = jax.grad(
            lambda t: jnp.sum(triplane_encode(t, x, tp_spec)))(tp)
        return (x + jnp.sum(g["grid3d"][0]) * 1e-12) % 1.0
    print(f"triplane fwd+bwd       {chain(jax.jit(tp_fwd_bwd), xn_tp):8.2f} ms",
          flush=True)

    # hash encode fwd / fwd+bwd, chained through the sample positions
    M = N * K
    spec = BrickGridSpec.create(per_level_scale=mcfg.per_level_scale)
    table = init_brick_table(jax.random.PRNGKey(1), spec)
    xn0 = jnp.asarray(rng.random((M, 3)).astype(np.float32))

    def enc_fwd(x):
        f = brick_encode(table, x, spec)
        return (x + jnp.sum(f) * 1e-12) % 1.0
    print(f"hash encode fwd        {chain(jax.jit(enc_fwd), xn0):8.2f} ms",
          flush=True)

    def enc_fwd_bwd(x):
        g = jax.grad(lambda t: jnp.sum(brick_encode(t, x, spec)))(table)
        return (x + jnp.sum(g[0, 0, 0]) * 1e-12) % 1.0
    print(f"hash encode fwd+bwd    {chain(jax.jit(enc_fwd_bwd), xn0):8.2f} ms",
          flush=True)

    # composite fwd+bwd on the (N, K) layout
    sig0 = jnp.asarray(rng.random((N, K)).astype(np.float32) * 50)
    raws = jnp.asarray(rng.random((N, K, 9)).astype(np.float32))
    dt = jnp.full((N, K), 0.0017)
    ts = jnp.cumsum(dt, axis=1)
    valid = jnp.ones((N, K), bool)

    def comp_fwd_bwd(sig):
        def f(s):
            o = composite_rays(s, raws, dt, ts, valid, 1e-4)
            return jnp.sum(o["rend"]) + jnp.sum(o["depth"]) + jnp.sum(o["opacity"])
        g = jax.grad(f)(sig)
        return sig + g * 1e-9
    print(f"composite fwd+bwd      {chain(jax.jit(comp_fwd_bwd), sig0):8.2f} ms",
          flush=True)

    # top_k select at march shapes
    inc0 = jnp.asarray(rng.random((N, S)) < 0.05)

    def topk_step(inc):
        from normal_clustering_nerf_tpu.ops.ray_march import select_first_k
        idx, v = select_first_k(inc, K)
        return jnp.roll(inc, 1, axis=1) ^ (jnp.sum(idx) % 2 == 0)
    print(f"top_k 1024->32         {chain(jax.jit(topk_step), inc0):8.2f} ms",
          flush=True)


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def profile_update_and_field():
    """Occupancy-refresh and full-field timings (run with --extra)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from normal_clustering_nerf_tpu.config import ModelConfig
    from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
    from normal_clustering_nerf_tpu.models.occupancy import OccupancyGrid

    rng = np.random.default_rng(0)
    for layout in ("triplane", "brick"):
        mcfg = ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                           hash_layout=layout, pred_norm_nn=True,
                           pred_sem=True, n_sem_cls=3)
        model = NGPMT(mcfg)
        params = model.init(jax.random.PRNGKey(0))
        occ = OccupancyGrid(mcfg)
        st0 = occ.init_state()

        def upd(st):
            density_fn = lambda x: model.density(params, x)
            return occ.update(st, density_fn, jax.random.PRNGKey(3),
                              591.0, warmup=False)
        f = jax.jit(upd)
        st = f(st0)

        def chain_occ(st):
            return f(st)
        t = chain(chain_occ, st, n=10)
        print(f"occ update [{layout:8s}]  {t:8.2f} ms "
              f"(/16 steps = {t/16:.2f} ms/step)", flush=True)

        # full field fwd+bwd (encode + all MLP heads) at M = 262144
        M = 262144
        x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (M, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((M, 3)).astype(np.float32))

        def field_fb(x):
            def loss(p):
                out = model(p, x, d)
                return (jnp.sum(out["rgbs"]) + jnp.sum(out["sigmas"])
                        + jnp.sum(out["sems"]) + jnp.sum(out["norms"]))
            g = jax.grad(loss)(params)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return (x + jnp.sum(leaf) * 1e-12) % 1.0
        print(f"field fwd+bwd [{layout:8s}] {chain(jax.jit(field_fb), x0):8.2f} ms",
              flush=True)


if __name__ == "__main__" and "--extra" in sys.argv:
    profile_update_and_field()
