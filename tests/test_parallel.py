"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 strategy item 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normal_clustering_nerf_tpu.config import (
    DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
    TrainConfig,
)
from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.parallel.mesh import make_mesh
from normal_clustering_nerf_tpu.training import Trainer
from normal_clustering_nerf_tpu.training.distributed import (
    make_sharded_occ_update, make_sharded_train_step,
)


def _cfg(batch):
    return TrainConfig(
        model=ModelConfig(
            scale=0.5, grid_size=16, max_samples=64,
            n_levels=4, log2_hashmap_size=10, base_resolution=4,
        ),
        render=RenderConfig(march_block=64, sample_budget=2048),
        loss=LossConfig(opacity_w=1e-3),
        data=DataConfig(batch_size=batch),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=4),
    )


@pytest.fixture(scope="module")
def scene():
    return SyntheticDataset(split="train", img_wh=(16, 16), n_images=4).load()


def test_mesh_construction():
    mesh = make_mesh((-1,), ("rays",))
    assert mesh.devices.size == len(jax.devices())
    mesh4 = make_mesh((4,), ("rays",))
    assert mesh4.devices.size == 4


def test_sharded_train_step_runs_and_replicates(scene):
    n = 8
    tr = Trainer(_cfg(batch=64 * n), scene)
    mesh = make_mesh((n,), ("rays",))
    step_fn = make_sharded_train_step(tr, mesh)
    state, metrics = step_fn(tr.state, tr.scene_dev)
    jax.block_until_ready(state.params)
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state.step) == 1
    # params updated (training actually happened)
    before = jax.tree_util.tree_leaves(tr.state.params)[0]
    # state was donated; re-run from returned state to confirm progress
    state2, _ = step_fn(state, tr.scene_dev)
    assert int(state2.step) == 2


def test_sharded_occ_update_pmax_merge(scene):
    n = 8
    tr = Trainer(_cfg(batch=64 * n), scene)
    mesh = make_mesh((n,), ("rays",))
    upd = make_sharded_occ_update(tr, mesh, warmup=False)
    occ = upd(tr.state.occ, tr.state.params, jax.random.PRNGKey(0))
    grid = np.asarray(occ.density_grid)
    assert np.isfinite(grid).all()
    # non-warmup update samples cells: some got fresh (positive) sigma
    assert (grid > 0).any()


def test_single_vs_multichip_loss_comparable(scene):
    """Sharded and single-chip steps optimize the same objective: with
    identical params the per-chip losses average to a comparable value."""
    tr = Trainer(_cfg(batch=512), scene)
    mesh = make_mesh((8,), ("rays",))
    step_fn = make_sharded_train_step(tr, mesh)
    single_state, m1 = tr._train_step(tr.state, tr.scene_dev)
    tr2 = Trainer(_cfg(batch=512), scene)
    sharded_state, m8 = step_fn(tr2.state, tr2.scene_dev)
    # different RNG streams -> not equal, but same scale
    assert abs(float(m1["loss_total"]) - float(m8["loss_total"])) < 0.5 * (
        abs(float(m1["loss_total"])) + 1e-3) + 0.2


def test_trainer_wires_mesh_from_config(scene):
    """--num_chips wiring: Trainer with parallel.mesh_shape=(8,) must
    build its own mesh and route fit() through the sharded step + pmax
    occ update (VERDICT r1 item 3)."""
    from normal_clustering_nerf_tpu.config import ParallelConfig

    n = 8
    cfg = _cfg(batch=48 * n)
    cfg = cfg.replace(parallel=ParallelConfig(mesh_shape=(n,)),
                      optim=cfg.optim.__class__(
                          **{**cfg.optim.__dict__, "num_epochs": 1,
                             "steps_per_epoch": 3}))
    tr = Trainer(cfg, scene)
    assert tr.mesh is not None and tr.mesh.devices.size == n
    out = tr.fit(log_every=0)
    assert np.isfinite(out["loss_total"])
    assert int(tr.state.step) == 3


def test_trainer_single_device_default(scene):
    tr = Trainer(_cfg(batch=64), scene)
    assert tr.mesh is None
