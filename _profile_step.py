"""Break down train-step time into stages on the real chip.

Each stage is jitted separately (so fusion across stages is lost — the
numbers are upper bounds per stage, and the fused full step is the
ground truth), warmed up, and timed over repeats.
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
from normal_clustering_nerf_tpu.training import Trainer
from normal_clustering_nerf_tpu.models.rendering import render_train
from normal_clustering_nerf_tpu.ops.ray_march import march_rays_train
from normal_clustering_nerf_tpu.ops.ray_aabb import ray_aabb_intersect
from normal_clustering_nerf_tpu.models.hash_encoding import hash_encode


def timed(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


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
            norm_D_C_centr_L1_w=0.1, norm_can_tres=0.3,
            sem_w=0.04,
        ),
        data=DataConfig(batch_size=batch,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=1000),
    )
    scene = SyntheticDataset(split="train", img_wh=(128, 128), n_images=16).load()
    trainer = Trainer(cfg, scene)
    trainer.mark_invisible_cells()
    # converge occupancy like bench
    for step in range(128):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(7), step)
            occ = trainer._occ_update[step < cfg.optim.warmup_steps](
                trainer.state.occ, trainer.state.params, k)
            trainer.state = trainer.state._replace(occ=occ)
        trainer.state, _ = trainer._train_step(trainer.state, trainer.scene_dev)
    jax.block_until_ready(trainer.state.params)

    t0 = time.perf_counter()
    n_full = 30
    for _ in range(n_full):
        trainer.state, _m = trainer._train_step(trainer.state, trainer.scene_dev)
    jax.block_until_ready(trainer.state.params)
    print(f"full fused step: {(time.perf_counter() - t0) / n_full * 1e3:8.2f} ms", flush=True)

    state = trainer.state
    # deep-copy out of the donated pytree so stage benches own their buffers
    state = jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, 'dtype') else x, state)
    jax.block_until_ready(state.params)
    model = trainer.model
    mcfg = cfg.model
    rcfg = cfg.render
    bitfield = state.occ.density_bitfield

    # assemble a ray batch
    key = jax.random.PRNGKey(0)
    batch_idx = trainer.sampler.sample(key)
    rays_o, rays_d = jax.jit(trainer._assemble_rays)(
        state.params, batch_idx, trainer.scene_dev)
    jax.block_until_ready(rays_o)

    hits = jax.jit(lambda o, d: ray_aabb_intersect(
        o, d, jnp.zeros(3), jnp.full(3, mcfg.scale)))(rays_o, rays_d)
    N = rays_o.shape[0]
    noise = jax.random.uniform(key, (N,))
    budget = rcfg.sample_budget

    march = jax.jit(lambda o, d, h, b, n: march_rays_train(
        o, d, h, b, n, cascades=mcfg.cascades, scale=mcfg.scale,
        exp_step_factor=mcfg.exp_step_factor, grid_size=mcfg.grid_size,
        max_samples=mcfg.max_samples, sample_budget=budget,
        march_steps=rcfg.march_block, per_ray_cap=budget // N))
    print(f"march only:      {timed(march, rays_o, rays_d, hits, bitfield, noise):8.2f} ms", flush=True)

    mr = march(rays_o, rays_d, hits, bitfield, noise)
    xyz = rays_o[mr.ray_id] + mr.t[:, None] * rays_d[mr.ray_id]
    dirs = rays_d[mr.ray_id]
    jax.block_until_ready(xyz)
    print(f"samples: budget={budget} rm={int(mr.rm_samples)}")

    spec = model.grid_spec
    if mcfg.hash_layout == "brick":
        from normal_clustering_nerf_tpu.models.brick_hash import brick_encode
        enc_fn = brick_encode
    else:
        enc_fn = hash_encode
    henc = jax.jit(lambda tb, x: enc_fn(tb, x, spec))
    xn = (xyz + mcfg.scale) / (2.0 * mcfg.scale)
    print(f"hash fwd:        {timed(henc, state.params['model']['hash_table'], xn):8.2f} ms", flush=True)

    def hash_bwd(tb, x):
        return jax.grad(lambda t: jnp.sum(enc_fn(t, x, spec)))(tb)
    hb = jax.jit(hash_bwd)
    print(f"hash fwd+bwd:    {timed(hb, state.params['model']['hash_table'], xn):8.2f} ms", flush=True)

    field = jax.jit(lambda p, x, d: model(p, x, d))
    print(f"field fwd:       {timed(field, state.params['model'], xyz, dirs):8.2f} ms", flush=True)

    def field_bwd(p, x, d):
        def f(p):
            out = model(p, x, d)
            return jnp.sum(out["sigmas"]) + jnp.sum(out["rgbs"])
        return jax.grad(f)(p)
    fb = jax.jit(field_bwd)
    print(f"field fwd+bwd:   {timed(fb, state.params['model'], xyz, dirs):8.2f} ms", flush=True)

    rt = jax.jit(lambda p, b, o, d, k: render_train(
        model, p, b, o, d, k, rcfg, global_step=1000))
    print(f"render fwd:      {timed(rt, state.params['model'], bitfield, rays_o, rays_d, key):8.2f} ms", flush=True)

    def render_bwd(p, b, o, d, k):
        def f(p):
            r = render_train(model, p, b, o, d, k, rcfg, global_step=1000)
            return jnp.sum(r["rgb"]) + jnp.sum(r["depth"])
        return jax.grad(f)(p)
    rb = jax.jit(render_bwd)
    print(f"render fwd+bwd:  {timed(rb, state.params['model'], bitfield, rays_o, rays_d, key):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
