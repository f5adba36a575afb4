"""Execute the multi-host launcher for real: 2 OS processes, each with
4 virtual CPU devices, form one 8-device mesh via
jax.distributed.initialize (parallel/launch.py) and run a sharded
train chunk whose numerics must match the same chunk on a
single-process 8-device mesh.

Replaces the job-level role of the reference's SLURM generators
(reference: experiments/hypersim/train_one_euler.py:21-33) with the
jax-native multihost path (SURVEY.md §2.4)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_chunk_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "multihost_child.py")
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own 4-device flag
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"rank{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, child, coord, str(pid), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    fails = []
    for pid, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
            fails.append(f"rank{pid} TIMEOUT\n{err.decode()[-2000:]}")
            continue
        if p.returncode != 0:
            fails.append(f"rank{pid} rc={p.returncode}\n"
                         f"{err.decode()[-2000:]}")
    assert not fails, "\n".join(fails)

    recs = [json.load(open(o)) for o in outs]
    for r in recs:
        assert r["process_count"] == 2
        assert r["device_count"] == 8
        assert r["step"] == 2
    # both ranks observe the identical replicated loss
    assert recs[0]["loss"] == recs[1]["loss"]
    assert np.isfinite(recs[0]["loss"])

    # single-process oracle: same config, same seeds, 8 local devices
    # (this pytest process runs under conftest's 8-device CPU platform)
    from normal_clustering_nerf_tpu.parallel.mesh import make_mesh
    from normal_clustering_nerf_tpu.training.distributed import (
        make_sharded_train_chunk,
    )
    import jax

    from normal_clustering_nerf_tpu.config import (
        DataConfig, LossConfig, ModelConfig, OptimConfig, RenderConfig,
        TrainConfig,
    )
    from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
    from normal_clustering_nerf_tpu.training import Trainer

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
    mesh = make_mesh((8,), ("rays",))
    chunk_fn = make_sharded_train_chunk(tr, mesh, n_steps=2)
    state, metrics = chunk_fn(tr.state, tr.scene_dev)
    loss1 = float(jax.device_get(
        jax.tree_util.tree_leaves(metrics["loss_total"])[0]))
    np.testing.assert_allclose(recs[0]["loss"], loss1, rtol=1e-5)
