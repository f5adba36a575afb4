#!/usr/bin/env python
"""Training CLI — reference-compatible entry point.

Drop-in analogue of the reference's `python train_nerf.py ...`
(reference: train_nerf.py:808-967) with the same flag names (opt.py).
Builds the dataset, trains with the jitted TPU pipeline, validates,
and writes the results.csv contract consumed by the experiments layer.
"""
import os
import sys

from normal_clustering_nerf_tpu.config import TrainConfig


def main(argv=None):
    # Platform override must go through jax.config: this image's
    # sitecustomize pre-imports jax, so JAX_PLATFORMS env is already read.
    platform = os.environ.get("NCNERF_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    try:  # persistent compile cache: repeat runs skip remote compiles
        import jax
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = TrainConfig.from_args(argv)
    if not cfg.no_debug:
        cfg = cfg.debug_overrides()

    from normal_clustering_nerf_tpu.parallel import initialize_multihost
    initialize_multihost()

    from normal_clustering_nerf_tpu.datasets import get_dataset
    from normal_clustering_nerf_tpu.utils.rotations import R_offset_from_angles
    # scene rotation offset for the paper's rotation ablation
    # (reference: train_nerf.py:109-122 -> datasets/hypersim.py:82-95)
    R_offset = R_offset_from_angles(
        cfg.loss.norm_yaw_offset_ang, cfg.loss.norm_pitch_offset_ang,
        cfg.loss.norm_roll_offset_ang)
    ds_cls = get_dataset(cfg.data.dataset_name)
    if cfg.data.dataset_name == "synthetic":
        train_ds = ds_cls(split=cfg.data.split, R_offset=R_offset)
        test_ds = ds_cls(split="test", R_offset=R_offset)
    else:
        ds_kwargs = dict(
            root_dir=cfg.data.root_dir,
            split_factor=cfg.data.split_factor, downsample=cfg.data.downsample,
            load_depth_gt=cfg.data.load_depth_gt,
            load_norm_gt=cfg.data.load_norm_gt,
            load_norm_depth_gt=cfg.data.load_norm_depth_gt,
            load_sem_gt=cfg.data.load_sem_gt,
            load_sem_WF_gt=cfg.data.load_sem_WF_gt,
            R_offset=R_offset,
        )
        train_ds = ds_cls(split=cfg.data.split, **ds_kwargs)
        test_ds = ds_cls(split="test", **ds_kwargs)

    from normal_clustering_nerf_tpu.training import Trainer
    trainer = Trainer(cfg, train_ds.load(), test_ds.load())

    if cfg.weight_path:
        from normal_clustering_nerf_tpu.training.checkpoints import load_weights
        params = load_weights(cfg.weight_path, trainer.state.params)
        trainer.state = trainer.state._replace(params=params)
    if cfg.ckpt_path:
        # full resume: params + optimizer + occupancy grid + step
        from normal_clustering_nerf_tpu.training.checkpoints import (
            restore_checkpoint,
        )
        trainer.state = restore_checkpoint(cfg.ckpt_path, trainer.state)

    log_dir = os.path.join(cfg.log_root_dir, cfg.exp_name or "run")
    os.makedirs(log_dir, exist_ok=True)
    from normal_clustering_nerf_tpu.training.loggers import MetricLogger
    logger = MetricLogger(log_dir, use_wandb=cfg.no_debug,
                          run_name=cfg.exp_name)

    # jax.profiler trace hook (SURVEY.md §5.1): NCNERF_PROFILE_DIR=<dir>
    # wraps fit in a trace; view with tensorboard/xprof
    profile_dir = os.environ.get("NCNERF_PROFILE_DIR")
    if not cfg.eval.val_only:
        import jax
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        trainer.fit(log_every=100 if cfg.no_debug else 10, logger=logger)
        if profile_dir:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_dir}")

    metrics = trainer.validate(
        save_vis_dir=os.path.join(log_dir, "results")
        if cfg.eval.save_test_vis else None,
        save_preds_dir=os.path.join(log_dir, "preds")
        if cfg.eval.save_test_preds else None,
        logger=logger,
    )
    print("validation:", {k: round(v, 4) for k, v in metrics.items()})

    if cfg.eval.save_train_preds:
        trainer.save_train_preds(os.path.join(log_dir, "preds"))

    from normal_clustering_nerf_tpu.training.results import save_results_csv
    save_results_csv(
        os.path.join(log_dir, "results.csv"), metrics, cfg,
        info={"step": int(trainer.state.step),
              "scene": getattr(train_ds, "scene_name", cfg.data.dataset_name)},
    )
    logger.close()

    if cfg.save_checkpoint:
        from normal_clustering_nerf_tpu.training.checkpoints import save_checkpoint
        save_checkpoint(os.path.join(log_dir, "ckpt"), trainer.state)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
