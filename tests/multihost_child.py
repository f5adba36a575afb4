"""Child process for test_multihost_launch: one rank of a 2-process
CPU-device multihost run (4 virtual devices per process, 8 global).

Forced to the cpu platform conftest-style: this image pre-imports jax
with the axon TPU plugin in every process, so JAX_PLATFORMS is too
late and jax.config.update is the only reliable override."""
import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives ride gloo
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass


def main():
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from normal_clustering_nerf_tpu.parallel.launch import (
        initialize_multihost,
    )

    ok = initialize_multihost(coordinator_address=coord,
                              num_processes=2, process_id=pid)
    assert ok, "initialize_multihost returned False for a 2-process run"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
        TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.parallel.mesh import make_mesh
    from normal_clustering_nerf_tpu.training import Trainer
    from normal_clustering_nerf_tpu.training.distributed import (
        make_sharded_train_chunk,
    )

    cfg = TrainConfig(
        model=ModelConfig(scale=0.5, grid_size=16, max_samples=64,
                          n_levels=4, log2_hashmap_size=10,
                          base_resolution=4),
        render=RenderConfig(march_block=64, sample_budget=2048),
        loss=LossConfig(opacity_w=1e-3),
        data=DataConfig(batch_size=512),
        optim=OptimConfig(num_epochs=1, steps_per_epoch=4),
    )
    scene = SyntheticDataset(split="train", img_wh=(16, 16),
                             n_images=4).load()
    tr = Trainer(cfg, scene)
    mesh = make_mesh((8,), ("rays",))  # spans both processes
    chunk_fn = make_sharded_train_chunk(tr, mesh, n_steps=2)
    state, metrics = chunk_fn(tr.state, tr.scene_dev)
    jax.block_until_ready(state.params)
    # metrics are fully replicated -> addressable on every process
    loss = float(jax.device_get(metrics["loss_total"]))
    step = int(jax.device_get(state.step))
    with open(out_path, "w") as f:
        json.dump({"loss": loss, "step": step,
                   "process_count": jax.process_count(),
                   "device_count": jax.device_count()}, f)


if __name__ == "__main__":
    main()
