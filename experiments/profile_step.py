#!/usr/bin/env python
"""Decompose the train step cost on real hardware.

Times each pipeline stage as its own jitted function on the bench
configuration (batch 8192, grid 128, L=16) after a short occupancy
warmup, so the march reflects realistic sparsity. Prints a ms-per-step
table — the data perf work is driven by (VERDICT r1: "profiling, not
guesses").
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
    TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.models.rendering import render_train
from normal_clustering_nerf_tpu.ops.composite import composite_rays
from normal_clustering_nerf_tpu.ops.ray_aabb import ray_aabb_intersect
from normal_clustering_nerf_tpu.ops.ray_march import march_rays_train_dense
from normal_clustering_nerf_tpu.training import Trainer


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    batch = 8192
    cfg = TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=128, max_samples=1024,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3,
        ),
        render=RenderConfig(march_block=1024, sample_budget=batch * 32),
        loss=LossConfig(
            opacity_w=1e-3, distortion_w=1e-3,
            norm_D_C_ort_dot_w=0.1, norm_D_C_centr_dot_w=0.1,
            norm_D_C_centr_L1_w=0.1, norm_can_tres=0.3, sem_w=0.04,
        ),
        data=DataConfig(batch_size=batch,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=1000),
    )
    scene = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16).load()
    trainer = Trainer(cfg, scene)
    trainer.mark_invisible_cells()
    print("warmup 48 steps...", flush=True)
    for step in range(48):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(7), step)
            occ = trainer._occ_update[step < cfg.optim.warmup_steps](
                trainer.state.occ, trainer.state.params, k)
            trainer.state = trainer.state._replace(occ=occ)
        trainer.state, _ = trainer._train_step(trainer.state, trainer.scene_dev)
    jax.block_until_ready(trainer.state.params)

    state = trainer.state
    model = trainer.model
    mcfg = cfg.model
    rcfg = cfg.render
    params = state.params["model"]
    bitfield = state.occ.density_bitfield

    key = jax.random.PRNGKey(0)
    batch_idx = trainer.sampler.sample(key)
    rays_o, rays_d = jax.jit(trainer._assemble_rays)(
        state.params, batch_idx, trainer.scene_dev)
    jax.block_until_ready(rays_o)
    N = rays_o.shape[0]
    K = rcfg.sample_budget // N

    hits_t = ray_aabb_intersect(rays_o, rays_d, jnp.zeros(3),
                                jnp.full(3, mcfg.scale))
    noise = jax.random.uniform(key, (N,))

    march_kw = dict(
        cascades=mcfg.cascades, scale=mcfg.scale,
        exp_step_factor=mcfg.exp_step_factor, grid_size=mcfg.grid_size,
        max_samples=mcfg.max_samples, samples_per_ray=K,
        march_steps=rcfg.march_block,
    )
    march = jax.jit(lambda o, d, h, b, nz: march_rays_train_dense(
        o, d, h, b, nz, **march_kw))
    ms = timeit(march, rays_o, rays_d, hits_t, bitfield, noise)
    print(f"march_dense           {ms:8.2f} ms")

    mr = march(rays_o, rays_d, hits_t, bitfield, noise)
    xyz = (rays_o[:, None, :] + mr.t[..., None] * rays_d[:, None, :]
           ).reshape(N * K, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (N, K, 3)).reshape(N * K, 3)
    jax.block_until_ready(xyz)

    field = jax.jit(lambda p, x, d: model(p, x, d))
    ms = timeit(field, params, xyz, dirs)
    print(f"field fwd (256k)      {ms:8.2f} ms")

    def field_bwd(p, x, d):
        out = model(p, x, d)
        return (jnp.sum(out["sigmas"]) + jnp.sum(out["rgbs"])
                + jnp.sum(out["norms"]) + jnp.sum(out["sems"]))
    fg = jax.jit(jax.grad(field_bwd))
    ms = timeit(fg, params, xyz, dirs)
    print(f"field fwd+bwd         {ms:8.2f} ms")

    comp_in = field(params, xyz, dirs)
    sig = comp_in["sigmas"].reshape(N, K)
    raws = jnp.concatenate(
        [comp_in["rgbs"], comp_in["norms"], comp_in["sems"]], -1
    ).reshape(N, K, -1)
    comp = jax.jit(lambda s, r, dt, t, v: composite_rays(s, r, dt, t, v))
    ms = timeit(comp, sig, raws, mr.dt, mr.t, mr.valid)
    print(f"composite fwd         {ms:8.2f} ms")

    rt = jax.jit(lambda p, o, d, k: render_train(
        model, p, bitfield, o, d, k, rcfg))
    ms = timeit(rt, params, rays_o, rays_d, key)
    print(f"render_train fwd      {ms:8.2f} ms")

    def render_loss(p, o, d, k):
        out = render_train(model, p, bitfield, o, d, k, rcfg)
        return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth"])
                + jnp.sum(out["opacity"]))
    rg = jax.jit(jax.grad(render_loss))
    ms = timeit(rg, params, rays_o, rays_d, key)
    print(f"render_train fwd+bwd  {ms:8.2f} ms")

    # _train_step donates state: thread it through the timing loop
    st = state
    for _ in range(3):
        st, _m = trainer._train_step(st, trainer.scene_dev)
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        st, _m = trainer._train_step(st, trainer.scene_dev)
    jax.block_until_ready(st.params)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"full train step       {ms:8.2f} ms "
          f"({batch / ms * 1e3:,.0f} rays/s)")

    from functools import partial
    occ_plain = jax.jit(partial(trainer._occ_update_impl, warmup=False))
    k = jax.random.PRNGKey(9)
    ms = timeit(lambda: occ_plain(st.occ, st.params, k), n=5)
    print(f"occ update (per call) {ms:8.2f} ms "
          f"(amortized /16: {ms / 16:.2f})")


if __name__ == "__main__":
    main()
