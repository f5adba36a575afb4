#!/usr/bin/env python
"""Stage-level decomposition of the production train step on real HW.

Times the full step and its stages independently so optimization work
targets the real bottleneck (r2: step ~170ms; march 70 + encode-bwd 48
+ mlp 3 accounted; this script pins down the rest: composite,
distortion, clustering losses, optimizer, sampling).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from normal_clustering_nerf_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
    TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.losses import compute_losses
from normal_clustering_nerf_tpu.models.rendering import render_train
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hash_layout", default="triplane")
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()
    batch = args.batch
    cfg = TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=128, max_samples=1024,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3, hash_layout=args.hash_layout,
            compute_dtype=args.compute_dtype,
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
    # converge the occupancy grid a bit so sparsity is realistic
    for step in range(64):
        if step % 16 == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(7), step)
            occ = trainer._occ_update[step < 256](
                trainer.state.occ, trainer.state.params, k)
            trainer.state = trainer.state._replace(occ=occ)
        trainer.state, _ = trainer._train_step(trainer.state, trainer.scene_dev)
    jax.block_until_ready(trainer.state.params)
    state = trainer.state
    sc = trainer.scene_dev
    full_step = jax.jit(trainer._train_step_impl)  # no donation: reusable args
    print(f"full train step       {timeit(full_step, state, sc):8.2f} ms", flush=True)

    model = trainer.model
    sampler = trainer.sampler
    key = jax.random.PRNGKey(3)
    k_batch, k_render, k_loss = jax.random.split(key, 3)
    batch_idx = sampler.sample(k_batch)
    target = {"rgb": sc["rays"][batch_idx["img_idxs"], batch_idx["pix_idxs"]][..., :3]}
    for name in ("depth", "normals", "normals_depth", "semantics", "semantics_WF"):
        lk = f"label_{name}"
        if lk in sc:
            target[name] = sc[lk][batch_idx["img_idxs"], batch_idx["pix_idxs"]]

    @jax.jit
    def sample_only(k):
        return sampler.sample(k)
    print(f"sampler               {timeit(sample_only, k_batch):8.2f} ms", flush=True)

    rays_o, rays_d = jax.jit(trainer._assemble_rays)(state.params, batch_idx, sc)

    occ_kw = dict(coarse_occ=state.occ.coarse_occ,
                  sv_mask=state.occ.sv_mask, sv_payload=state.occ.sv_payload)

    from normal_clustering_nerf_tpu.ops.ray_march import (
        march_rays_train_dense_sv,
    )
    from normal_clustering_nerf_tpu.ops.ray_aabb import ray_aabb_intersect

    @jax.jit
    def march_only(bf_unused, sv_mask, sv_payload):
        hits_t = ray_aabb_intersect(
            rays_o, rays_d, jnp.zeros(3), jnp.full(3, cfg.model.scale))
        noise = jax.random.uniform(k_render, (rays_o.shape[0],))
        return march_rays_train_dense_sv(
            rays_o, rays_d, hits_t, sv_mask, sv_payload, noise,
            scale=cfg.model.scale, grid_size=cfg.model.grid_size,
            max_samples=cfg.model.max_samples,
            samples_per_ray=cfg.render.sample_budget // rays_o.shape[0],
            march_steps=cfg.render.march_block,
            n_intervals=cfg.render.sv_intervals)
    print(f"sv march only         {timeit(march_only, state.occ.density_bitfield, state.occ.sv_mask, state.occ.sv_payload):8.2f} ms", flush=True)

    @jax.jit
    def render_fwd(params, bf):
        return render_train(model, params["model"], bf, rays_o, rays_d,
                            k_render, cfg.render, global_step=1000,
                            depth_gt=target.get("depth"), **occ_kw)
    print(f"render fwd            {timeit(render_fwd, state.params, state.occ.density_bitfield):8.2f} ms", flush=True)

    @jax.jit
    def render_fwd_bwd(params, bf):
        def f(p):
            r = render_train(model, p["model"], bf, rays_o, rays_d,
                             k_render, cfg.render, global_step=1000,
                             depth_gt=target.get("depth"), **occ_kw)
            return (jnp.sum(r["rgb"] ** 2) + jnp.sum(r["depth"] ** 2)
                    + jnp.sum(r["opacity"]) + jnp.sum(r["norm_nn"] ** 2)
                    + jnp.sum(r["sem"] ** 2))
        return jax.grad(f)(params)
    print(f"render fwd+bwd        {timeit(render_fwd_bwd, state.params, state.occ.density_bitfield):8.2f} ms", flush=True)

    results = render_fwd(state.params, state.occ.density_bitfield)
    results = jax.tree_util.tree_map(jax.lax.stop_gradient, results)

    @jax.jit
    def losses_only(res):
        return compute_losses(
            res, target, cfg.loss, model.cfg, step=1000, key=k_loss,
            ray_sampling_strategy=cfg.data.ray_sampling_strategy,
            random_tr_poses=False, patch_area=sampler.patch_area,
            offsets_local=sampler.offsets_local,
        )["total"]
    print(f"losses (fixed render) {timeit(losses_only, results):8.2f} ms", flush=True)

    @jax.jit
    def loss_fwd_bwd(params, bf):
        def f(p):
            r = render_train(model, p["model"], bf, rays_o, rays_d,
                             k_render, cfg.render, global_step=1000,
                             depth_gt=target.get("depth"), **occ_kw)
            return compute_losses(
                r, target, cfg.loss, model.cfg, step=1000, key=k_loss,
                ray_sampling_strategy=cfg.data.ray_sampling_strategy,
                random_tr_poses=False, patch_area=sampler.patch_area,
                offsets_local=sampler.offsets_local,
            )["total"]
        return jax.grad(f)(params)
    print(f"loss fwd+bwd          {timeit(loss_fwd_bwd, state.params, state.occ.density_bitfield):8.2f} ms", flush=True)

    grads = loss_fwd_bwd(state.params, state.occ.density_bitfield)

    @jax.jit
    def opt_step(g, opt_state, params):
        updates, new_opt = trainer.tx.update(g, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return new_opt, params
    print(f"optimizer             {timeit(opt_step, grads, state.opt_state, state.params):8.2f} ms", flush=True)

    @jax.jit
    def occ_update(occ, params):
        return trainer._occ_update_impl(occ, params, jax.random.PRNGKey(0),
                                        warmup=False)
    print(f"occ update (per 16)   {timeit(occ_update, state.occ, state.params):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
