#!/usr/bin/env python
"""Micro-profile the march and field sub-stages on real hardware.

Times each primitive op of the two hot stages (VERDICT r1: march 79ms,
field fwd+bwd 99ms at batch 8192 on v5e) so the optimization work
targets the true bottleneck, not a guess.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.brick_hash import (
    BrickGridSpec, brick_encode, init_brick_table,
)
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT
from normal_clustering_nerf_tpu.ops.ray_march import (
    calc_dt, occupancy_lookup, select_first_k, t_step_grid,
)


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    N, S, K = 8192, 1024, 32
    mcfg = ModelConfig(scale=0.5, grid_size=128, max_samples=1024,
                       pred_norm_nn=True, pred_sem=True, n_sem_cls=3)
    G = mcfg.grid_size
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    rays_o = jax.random.uniform(k1, (N, 3), minval=-0.4, maxval=0.4)
    d = jax.random.normal(k2, (N, 3))
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t1 = jnp.zeros(N)
    # ~5% occupancy bitfield (steady-state-ish sparsity)
    bits = (jax.random.uniform(k3, (G ** 3 // 8 * 8,)) < 0.05)
    bitfield = jnp.packbits(bits, bitorder="little")

    kw = dict(exp_step_factor=mcfg.exp_step_factor,
              max_samples=mcfg.max_samples, grid_size=G, scale=mcfg.scale)

    # -- march sub-stages -------------------------------------------------
    grid_fn = jax.jit(lambda t: t_step_grid(t, S, **kw))
    print(f"t_step_grid (N,S)        {timeit(grid_fn, t1):8.2f} ms")

    tg = grid_fn(t1)

    def occ_probe(tg):
        dtg = calc_dt(tg, mcfg.exp_step_factor, mcfg.max_samples, G, mcfg.scale)
        xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
        return occupancy_lookup(xyz, dtg, bitfield, cascades=1,
                                scale=mcfg.scale, grid_size=G)
    occ_fn = jax.jit(occ_probe)
    print(f"xyz+occ probe (N,S)      {timeit(occ_fn, tg):8.2f} ms")

    include = occ_fn(tg)
    sel_fn = jax.jit(lambda inc: select_first_k(inc, K))
    print(f"top_k select (S->K)      {timeit(sel_fn, include):8.2f} ms")

    idx, valid = sel_fn(include)
    gath_fn = jax.jit(lambda tg, idx: jnp.take_along_axis(tg, idx, axis=1))
    print(f"take_along_axis          {timeit(gath_fn, tg, idx):8.2f} ms")

    # coarse variant: (N, 64) block probe + small top_k + (N, 256) fine
    SB = 64
    coarse_inc = include.reshape(N, SB, 16).max(axis=-1)
    selb_fn = jax.jit(lambda inc: select_first_k(inc, 16))
    print(f"top_k blocks (64->16)    {timeit(selb_fn, coarse_inc):8.2f} ms")
    inc256 = include[:, :256]
    self_fn = jax.jit(lambda inc: select_first_k(inc, K))
    print(f"top_k select (256->K)    {timeit(self_fn, inc256):8.2f} ms")

    def occ_probe_256(tg):
        tg = tg[:, :256]
        dtg = calc_dt(tg, mcfg.exp_step_factor, mcfg.max_samples, G, mcfg.scale)
        xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
        return occupancy_lookup(xyz, dtg, bitfield, cascades=1,
                                scale=mcfg.scale, grid_size=G)
    print(f"xyz+occ probe (N,256)    {timeit(jax.jit(occ_probe_256), tg):8.2f} ms")

    # -- field sub-stages -------------------------------------------------
    M = N * K
    xyz = jax.random.uniform(k4, (M, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, K, 3)).reshape(M, 3)

    spec = BrickGridSpec.create(per_level_scale=mcfg.per_level_scale)
    table = init_brick_table(jax.random.PRNGKey(1), spec)
    xn = (xyz + mcfg.scale) / (2 * mcfg.scale)

    enc_fn = jax.jit(lambda t, x: brick_encode(t, x, spec))
    print(f"hash encode fwd (262k)   {timeit(enc_fn, table, xn):8.2f} ms")

    enc_g = jax.jit(jax.grad(lambda t, x: jnp.sum(brick_encode(t, x, spec))))
    print(f"hash encode fwd+bwd      {timeit(enc_g, table, xn):8.2f} ms")

    tab16 = table.astype(jnp.bfloat16)
    enc16_fn = jax.jit(lambda t, x: brick_encode(t, x, spec, jnp.bfloat16))
    print(f"hash encode fwd bf16     {timeit(enc16_fn, tab16, xn):8.2f} ms")
    enc16_g = jax.jit(jax.grad(
        lambda t, x: jnp.sum(brick_encode(t, x, spec, jnp.bfloat16)
                             .astype(jnp.float32))))
    print(f"hash encode fwd+bwd bf16 {timeit(enc16_g, tab16, xn):8.2f} ms")

    # MLPs only (encode replaced by a constant)
    model = NGPMT(mcfg)
    params = model.init(jax.random.PRNGKey(2))
    enc_const = enc_fn(table, xn)

    def mlps(p, enc, d):
        from normal_clustering_nerf_tpu.models.ngp_mt import _apply_mlp
        from normal_clustering_nerf_tpu.ops.trunc_exp import trunc_exp
        h = _apply_mlp(p["sigma_net"], enc)
        sig = trunc_exp(h[:, 0])
        dn = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        rgb = _apply_mlp(p["rgb_net"], jnp.concatenate([dn, h], 1), "sigmoid")
        sem = _apply_mlp(p["sem_net"], h)
        nrm = _apply_mlp(p["norm_net"], h)
        return sig, rgb, sem, nrm
    mlp_fn = jax.jit(mlps)
    print(f"MLPs fwd (262k)          {timeit(mlp_fn, params, enc_const, dirs):8.2f} ms")
    mlp_g = jax.jit(jax.grad(
        lambda p, e, d: sum(jnp.sum(o) for o in mlps(p, e, d))))
    print(f"MLPs fwd+bwd             {timeit(mlp_g, params, enc_const, dirs):8.2f} ms")

    def mlps16(p, enc, d):
        from normal_clustering_nerf_tpu.models.ngp_mt import _apply_mlp
        from normal_clustering_nerf_tpu.ops.trunc_exp import trunc_exp
        cd = jnp.bfloat16
        h = _apply_mlp(p["sigma_net"], enc, compute_dtype=cd)
        sig = trunc_exp(h[:, 0].astype(jnp.float32))
        dn = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        rgb = _apply_mlp(p["rgb_net"], jnp.concatenate([dn.astype(cd), h], 1),
                         "sigmoid", compute_dtype=cd)
        sem = _apply_mlp(p["sem_net"], h, compute_dtype=cd)
        nrm = _apply_mlp(p["norm_net"], h, compute_dtype=cd)
        return sig, rgb, sem, nrm
    mlp16_g = jax.jit(jax.grad(
        lambda p, e, d: sum(jnp.sum(o.astype(jnp.float32))
                            for o in mlps16(p, e, d))))
    print(f"MLPs fwd+bwd bf16        {timeit(mlp16_g, params, enc_const, dirs):8.2f} ms")


if __name__ == "__main__":
    main()
