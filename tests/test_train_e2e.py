"""End-to-end training smoke tests on the synthetic Manhattan room
(SURVEY.md §4 strategy item 3: CPU-runnable train-loop correctness)."""
import dataclasses

import jax
import numpy as np
import pytest

from normal_clustering_nerf_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
    TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.training import Trainer


def _tiny_cfg(**loss_kw):
    return TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=16, max_samples=64,
            n_levels=6, log2_hashmap_size=12, base_resolution=4,
            pred_norm_nn=True, pred_norm_depth=True, pred_sem=True,
            n_sem_cls=3,
        ),
        render=RenderConfig(march_block=64, sample_budget=4096,
                            test_n_samples=16),
        loss=LossConfig(
            opacity_w=1e-3, sem_w=0.04, cluster_K=8, cluster_niter=4,
            **loss_kw,
        ),
        data=DataConfig(batch_size=192,
                        ray_sampling_strategy="all_images_triang"),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=60, lr=1e-2,
                          warmup_steps=16),
    )


@pytest.fixture(scope="module")
def scene():
    return SyntheticDataset(split="train", img_wh=(32, 32), n_images=6).load()


def test_training_improves_psnr(scene):
    cfg = _tiny_cfg()
    tr = Trainer(cfg, scene)
    tr.mark_invisible_cells()
    psnrs = []
    for step in range(60):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(0), step)
            occ = tr._occ_update[step < cfg.optim.warmup_steps](
                tr.state.occ, tr.state.params, k)
            tr.state = tr.state._replace(occ=occ)
        tr.state, m = tr._train_step(tr.state, tr.scene_dev)
        psnrs.append(float(m["psnr"]))
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 1.0, (
        f"PSNR did not improve: {psnrs[:5]} ... {psnrs[-5:]}"
    )
    assert int(tr.state.step) == 60


def test_full_fit_validate_and_clustering_losses(scene):
    cfg = _tiny_cfg(
        norm_D_C_ort_dot_w=0.05, norm_D_C_centr_dot_w=0.05,
        norm_D_C_centr_L1_w=0.05, norm_can_tres=0.3,
        distortion_w=1e-3, depth_w=0.05,
    )
    test_scene = SyntheticDataset(split="test", img_wh=(32, 32), n_images=2).load()
    tr = Trainer(cfg, scene, test_scene)
    final = tr.fit(log_every=0)
    assert np.isfinite(final["loss_total"])
    # clustering losses produced finite nonzero values at some point
    assert "loss_norm_D_C_ort_dot" in final
    metrics = tr.validate()
    assert np.isfinite(metrics["psnr"]) and metrics["psnr"] > 5.0
    assert "norm_depth_ang_mean" in metrics
    assert "miou" in metrics


def test_checkpoint_roundtrip(tmp_path, scene):
    from normal_clustering_nerf_tpu.training.checkpoints import (
        load_weights, save_weights,
    )
    cfg = _tiny_cfg()
    tr = Trainer(cfg, scene)
    p = str(tmp_path / "w.npz")
    save_weights(p, tr.state.params)
    # perturb then restore
    perturbed = jax.tree_util.tree_map(lambda a: a + 1.0, tr.state.params)
    restored = load_weights(p, perturbed)
    orig = jax.tree_util.tree_leaves(tr.state.params)
    rest = jax.tree_util.tree_leaves(restored)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_state_resume(tmp_path, scene):
    """Full orbax round-trip (params + opt_state + occ + step + key) and
    resume-continues-training (reference: train_nerf.py:960 ckpt_path)."""
    from normal_clustering_nerf_tpu.training.checkpoints import (
        restore_checkpoint, save_checkpoint,
    )
    cfg = _tiny_cfg()
    tr = Trainer(cfg, scene)
    tr.mark_invisible_cells()
    for step in range(20):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(0), step)
            occ = tr._occ_update[step < cfg.optim.warmup_steps](
                tr.state.occ, tr.state.params, k)
            tr.state = tr.state._replace(occ=occ)
        tr.state, m = tr._train_step(tr.state, tr.scene_dev)
    ck = str(tmp_path / "full_ckpt")
    save_checkpoint(ck, tr.state)

    # fresh trainer restores the complete state
    tr2 = Trainer(cfg, scene)
    tr2.state = restore_checkpoint(ck, tr2.state)
    assert int(tr2.state.step) == 20
    for a, b in zip(jax.tree_util.tree_leaves(tr.state),
                    jax.tree_util.tree_leaves(tr2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically to uninterrupted training
    s_cont, m_cont = tr._train_step(tr.state, tr.scene_dev)
    s_res, m_res = tr2._train_step(tr2.state, tr2.scene_dev)
    np.testing.assert_allclose(
        float(m_cont["loss_total"]), float(m_res["loss_total"]), rtol=1e-6)
    assert int(s_res.step) == 21


def test_training_improves_psnr_triplane(scene):
    """The TPU-fast triplane field (models/triplane.py) must learn the
    room at least as fast as the hash layout in early training."""
    cfg = _tiny_cfg()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, hash_layout="triplane", plane_res=65, grid3d_res=17))
    tr = Trainer(cfg, scene)
    tr.mark_invisible_cells()
    psnrs = []
    for step in range(60):
        if step % cfg.optim.update_interval == 0:
            k = jax.random.fold_in(jax.random.PRNGKey(0), step)
            occ = tr._occ_update[step < cfg.optim.warmup_steps](
                tr.state.occ, tr.state.params, k)
            tr.state = tr.state._replace(occ=occ)
        tr.state, m = tr._train_step(tr.state, tr.scene_dev)
        psnrs.append(float(m["psnr"]))
    assert np.isfinite(psnrs).all()
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:10]) + 1.0, (
        f"PSNR did not improve: {psnrs[:5]} ... {psnrs[-5:]}"
    )


def test_chunked_scan_matches_single_steps(scene):
    """The fused lax.scan chunk (one dispatch per occupancy interval)
    must be bit-identical to `update_interval` individual train steps."""
    cfg = _tiny_cfg()
    tr_a = Trainer(cfg, scene)
    tr_a.mark_invisible_cells()
    tr_b = Trainer(cfg, scene)
    tr_b.mark_invisible_cells()
    s_chunk, m_chunk = tr_a._train_chunk(tr_a.state, tr_a.scene_dev)
    state = tr_b.state
    for _ in range(cfg.optim.update_interval):
        state, m_single = tr_b._train_step(state, tr_b.scene_dev)
    for a, b in zip(jax.tree_util.tree_leaves(s_chunk.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s_chunk.step) == int(state.step)
    np.testing.assert_allclose(
        float(m_chunk["psnr"]), float(m_single["psnr"]), rtol=1e-6)
