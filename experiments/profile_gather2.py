#!/usr/bin/env python
"""Calibrated gather microbenchmarks: find out what exactly costs 70ms
in the occupancy probe and 42ms in the hash encode.

Varies inputs across iterations (defeats any result caching) and
calibrates against a known-bandwidth elementwise op.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N, S = 8192, 1024
G = 128
G3 = G ** 3
M = 262144
R, C = 8192, 128


def timeit(fn, args_list, n=10, warmup=2):
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(n):
        outs.append(fn(*args_list[i % len(args_list)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    # --- calibration: elementwise on 33.5M floats (134MB in + 134MB out)
    xs = [jax.random.normal(k, (N, S)) for k in ks[:4]]
    f = jax.jit(lambda x: x * 1.0001 + 1.0)
    ms = timeit(f, [(x,) for x in xs])
    print(f"calib: eltwise (N,S) f32 268MB traffic   {ms:8.2f} ms "
          f"({0.268 / (ms / 1e3):,.0f} GB/s)")

    # --- gathers at (N,S) scale, varying dtypes
    idxs = [jax.random.randint(k, (N, S), 0, G3 // 32, jnp.int32)
            for k in ks[:4]]
    words_i32 = jax.random.randint(ks[4], (G3 // 32,), 0, 2**31 - 1, jnp.int32)
    g32 = jax.jit(lambda w, i: w[i])
    print(f"gather int32 table (8.4M idx)            "
          f"{timeit(g32, [(words_i32, i) for i in idxs]):8.2f} ms")

    table_u8 = jax.random.randint(ks[5], (G3 // 8,), 0, 255, jnp.uint8)
    idx8 = [jax.random.randint(k, (N, S), 0, G3 // 8, jnp.int32)
            for k in ks[:4]]
    gu8 = jax.jit(lambda w, i: w[i])
    print(f"gather uint8 table (8.4M idx)            "
          f"{timeit(gu8, [(table_u8, i) for i in idx8]):8.2f} ms")

    # --- the actual occupancy_lookup composition (float math + gather)
    from normal_clustering_nerf_tpu.ops.ray_march import occupancy_lookup
    rays_o = jax.random.uniform(ks[6], (N, 3), minval=-0.4, maxval=0.4)
    d = jax.random.normal(ks[7], (N, 3))
    rays_d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tgs = [jax.random.uniform(k, (N, S), minval=0.0, maxval=1.7)
           for k in ks[:4]]

    def occ_full(tg):
        xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
        return occupancy_lookup(xyz, tg, table_u8, cascades=1, scale=0.5,
                                grid_size=G)
    print(f"occupancy_lookup full (8.4M)             "
          f"{timeit(jax.jit(occ_full), [(t,) for t in tgs]):8.2f} ms")

    def occ_xyz_only(tg):
        xyz = rays_o[:, None, :] + tg[..., None] * rays_d[:, None, :]
        cell = jnp.clip((xyz + 0.5) * G, 0.0, G - 1.0).astype(jnp.int32)
        return (cell[..., 2] * G + cell[..., 1]) * G + cell[..., 0]
    print(f"  xyz+cell+idx only                      "
          f"{timeit(jax.jit(occ_xyz_only), [(t,) for t in tgs]):8.2f} ms")

    idx_c = [occ_xyz_only(t) for t in tgs]

    def probe_only(idx):
        byte = table_u8[idx >> 3]
        return (byte >> (idx & 7).astype(jnp.uint8)) & jnp.uint8(1)
    print(f"  uint8 byte probe only                  "
          f"{timeit(jax.jit(probe_only), [(i,) for i in idx_c]):8.2f} ms")

    words32 = jax.random.randint(ks[8], (G3 // 32,), 0, 2**31 - 1, jnp.int32)

    def probe_i32(idx):
        w = words32[idx >> 5]
        return (w >> (idx & 31)) & 1
    print(f"  int32 word probe only                  "
          f"{timeit(jax.jit(probe_i32), [(i,) for i in idx_c]):8.2f} ms")

    # --- hash-encode decomposition at M=262k
    from normal_clustering_nerf_tpu.models.brick_hash import (
        BrickGridSpec, _brick_geometry, _w64, brick_encode, init_brick_table,
    )
    spec = BrickGridSpec.create(per_level_scale=1.3819)
    table = init_brick_table(ks[9], spec)
    xns = [jax.random.uniform(k, (M, 3)) for k in ks[:4]]

    enc = jax.jit(lambda t, x: brick_encode(t, x, spec))
    print(f"brick_encode fwd (scan, 16 lvls)         "
          f"{timeit(enc, [(table, x) for x in xns]):8.2f} ms")

    def enc_unrolled(t, x):
        feats = []
        for l in range(spec.n_levels):
            row, w4, _ = _brick_geometry(
                x, spec.scales[l], spec.resolutions[l], spec.nb_axis[l],
                spec.dense[l], spec.n_bricks)
            rows = t[l][row].reshape(M, 64, 2)
            feats.append(jnp.einsum("ms,msf->mf", _w64(w4), rows))
        return jnp.concatenate(feats, -1)
    print(f"brick_encode fwd (unrolled python)       "
          f"{timeit(jax.jit(enc_unrolled), [(table, x) for x in xns]):8.2f} ms")

    def gather_only(t, x):
        acc = jnp.zeros((M, C))
        for l in range(spec.n_levels):
            row, _, _ = _brick_geometry(
                x, spec.scales[l], spec.resolutions[l], spec.nb_axis[l],
                spec.dense[l], spec.n_bricks)
            acc = acc + t[l][row]
        return acc
    print(f"  row gathers only (16 x 262k x 128)     "
          f"{timeit(jax.jit(gather_only), [(table, x) for x in xns]):8.2f} ms")

    def geom_only(x):
        acc = jnp.zeros((M,), jnp.int32)
        accw = jnp.zeros((M, 64))
        for l in range(spec.n_levels):
            row, w4, _ = _brick_geometry(
                x, spec.scales[l], spec.resolutions[l], spec.nb_axis[l],
                spec.dense[l], spec.n_bricks)
            acc = acc + row
            accw = accw + _w64(w4)
        return acc, accw
    print(f"  geometry+w64 only                      "
          f"{timeit(jax.jit(geom_only), [(x,) for x in xns]):8.2f} ms")

    def einsum_only(t, x):
        out = []
        row = jax.random.randint(ks[10], (M,), 0, spec.n_bricks, jnp.int32)
        for l in range(spec.n_levels):
            rows = t[l][row].reshape(M, 64, 2)
            w = x[:, :1] * jnp.ones((M, 64))
            out.append(jnp.einsum("ms,msf->mf", w, rows))
        return jnp.concatenate(out, -1)
    print(f"  gather+einsum (no geom)                "
          f"{timeit(jax.jit(einsum_only), [(table, x[:, :64]) for x in xns]):8.2f} ms")


if __name__ == "__main__":
    main()
