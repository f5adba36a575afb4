"""Dataset-loader tests against tiny synthetic on-disk fixtures
(SURVEY.md §4: the reference has no tests; loaders verified here via
generated scenes in the exact on-disk formats)."""
import json
import math
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")


# ------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def scannet_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_scene")
    H, W = 480, 640
    (root / "images").mkdir()
    (root / "pose").mkdir()
    (root / "depth_colmap").mkdir()
    (root / "semantic_deeplab").mkdir()
    K = np.array([[577.0, 0, 320.0], [0, 577.0, 240.0], [0, 0, 1]])
    np.savetxt(root / "intrinsic.txt", np.vstack([np.hstack([K, np.zeros((3, 1))]),
                                                  [0, 0, 0, 1]]))
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.png"), img)
        pose = np.eye(4)
        pose[:3, 3] = rng.uniform(-0.5, 0.5, 3)
        np.savetxt(root / "pose" / f"{i}.txt", pose)
        depth = rng.uniform(0, 3.0, (H, W)).astype(np.float32)
        np.save(root / "depth_colmap" / f"{i}.npy", depth)
        sem = np.full((H, W), 7, np.uint8)
        sem[:100] = 80    # wall
        sem[200:300] = 160  # floor
        cv2.imwrite(str(root / "semantic_deeplab" / f"{i}.png"), sem)
    return str(root)


@pytest.fixture(scope="module")
def replica_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("replica")
    scene = base / "room_x"
    seq = scene / "Sequence_1"
    for d in ("rgb", "depth", "semantic_class"):
        (seq / d).mkdir(parents=True)
    sem_info = base / "semantic_info" / "room_x"
    sem_info.mkdir(parents=True)
    with open(sem_info / "info_semantic.json", "w") as f:
        json.dump({"classes": [{"name": f"c{i}"} for i in range(1, 100)]}, f)
    n, H, W = 24, 48, 64
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4)[None], (n, 1, 1))
    poses[:, :3, 3] = rng.uniform(-1, 1, (n, 3))
    np.savetxt(seq / "traj_w_c.txt", poses.reshape(n, 16), delimiter=" ")
    for i in range(n):
        cv2.imwrite(str(seq / "rgb" / f"rgb_{i}.png"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        cv2.imwrite(str(seq / "depth" / f"depth_{i}.png"),
                    rng.integers(500, 4000, (H, W)).astype(np.uint16))
        sem = np.full((H, W), 5, np.uint16)
        sem[:10] = 93   # wall
        sem[20:30] = 40  # floor
        cv2.imwrite(str(seq / "semantic_class" / f"semantic_class_{i}.png"), sem)
    return str(scene), (H, W)


@pytest.fixture(scope="module")
def hypersim_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ai_900_001")
    H, W = 768, 1024
    images = root / "images"
    detail = root / "_detail"
    cam = "cam_00"
    (images / f"scene_{cam}_final_hdf5").mkdir(parents=True)
    (images / f"scene_{cam}_geometry_hdf5").mkdir(parents=True)
    (detail / cam).mkdir(parents=True)
    # metadata_scene.csv with meters_per_asset_unit
    with open(detail / "metadata_scene.csv", "w") as f:
        f.write("parameter_name,parameter_value\nmeters_per_asset_unit,0.025\n")
    rng = np.random.default_rng(2)
    n = 4
    trans = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    rots = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    fidx = np.arange(n)
    for name, arr in [("camera_keyframe_positions.hdf5", trans),
                      ("camera_keyframe_orientations.hdf5", rots),
                      ("camera_keyframe_frame_indices.hdf5", fidx)]:
        with h5py.File(detail / cam / name, "w") as f:
            f.create_dataset("dataset", data=arr)
    for i in range(n):
        frame = f"{i:04d}"
        with h5py.File(images / f"scene_{cam}_final_hdf5" /
                       f"frame.{frame}.color.hdf5", "w") as f:
            f.create_dataset(
                "dataset", data=rng.uniform(0, 2, (H, W, 3)).astype(np.float32))
        geo = images / f"scene_{cam}_geometry_hdf5"
        with h5py.File(geo / f"frame.{frame}.render_entity_id.hdf5", "w") as f:
            f.create_dataset("dataset", data=np.ones((H, W), np.int32))
        with h5py.File(geo / f"frame.{frame}.depth_meters.hdf5", "w") as f:
            d = rng.uniform(0.5, 5.0, (H, W)).astype(np.float32)
            d[0, 0] = np.nan  # exercise NaN handling
            f.create_dataset("dataset", data=d)
        with h5py.File(geo / f"frame.{frame}.normal_bump_world.hdf5", "w") as f:
            nrm = rng.standard_normal((H, W, 3)).astype(np.float32)
            nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
            f.create_dataset("dataset", data=nrm)
        with h5py.File(geo / f"frame.{frame}.semantic.hdf5", "w") as f:
            sem = np.full((H, W), 3, np.int16)
            sem[:100] = 1   # wall
            sem[-100:] = 2  # floor
            sem[200:210] = 9   # window -> wall in WF
            f.create_dataset("dataset", data=sem)
    return str(root)


# ----------------------------------------------------------------- tests
def test_scannet_loader(scannet_dir):
    from normal_clustering_nerf_tpu.datasets.scannet_manhattan import (
        ScanNetManhattanDataset,
    )
    ds = ScanNetManhattanDataset(
        scannet_dir, split="train", load_depth_gt=True, load_sem_WF_gt=True)
    s = ds.load()
    assert s.n_images == 2  # even frames of 4
    assert s.rays.shape == (2, 640 * 480, 3)
    assert s.img_wh == (640, 480)
    # semantics remapped to wall=1/floor=2/rest=3
    assert set(np.unique(s.labels["semantics_WF"])) <= {1, 2, 3}
    # depth rescaled by scene diameter (2*scale = 2*1.2*1.05)
    assert s.labels["depth"].max() <= 3.0 / (2 * 1.2 * 1.05) + 1e-5
    # poses rescaled into [-0.5, 0.5]
    assert np.abs(s.poses[:, :, 3]).max() <= 0.5
    # ray dirs unit-norm ('distance' convention)
    np.testing.assert_allclose(
        np.linalg.norm(s.directions, axis=-1), 1.0, atol=1e-5)
    # test split = odd frames
    s2 = ScanNetManhattanDataset(scannet_dir, split="test").load()
    assert s2.n_images == 2
    assert s2.img_ids != s.img_ids


def test_replica_loader(replica_dir):
    from normal_clustering_nerf_tpu.datasets.replica_semnerf import (
        ReplicaSemNerfDataset,
    )
    root, (H, W) = replica_dir
    ds = ReplicaSemNerfDataset(
        root, split="train", load_depth_gt=True, load_sem_WF_gt=True,
        load_norm_depth_gt=True)
    s = ds.load()
    # 24 frames, stride-12 train split -> frames 0, 12
    assert s.n_images == 2
    assert s.img_wh == (W, H)
    assert set(np.unique(s.labels["semantics_WF"])) <= {1, 2, 3}
    assert "normals_depth" in s.labels
    # normals unit or zero
    nrm = s.labels["normals_depth"].reshape(-1, 3)
    lens = np.linalg.norm(nrm, axis=-1)
    assert np.all((lens < 1e-6) | (np.abs(lens - 1) < 1e-4))
    assert np.abs(s.poses[:, :, 3]).max() <= 0.5 + 1e-6


def test_hypersim_loader(hypersim_dir):
    from normal_clustering_nerf_tpu.datasets.hypersim import HypersimDataset
    ds = HypersimDataset(
        hypersim_dir, split="train", split_factor=0.5, downsample=0.125,
        load_depth_gt=True, load_norm_gt=True, load_sem_WF_gt=True)
    s = ds.load()
    assert s.n_images == 2  # half of 4
    W, H = s.img_wh
    assert (W, H) == (128, 96)
    # tonemapped rgb in [0, 1]
    assert s.rays.min() >= 0 and s.rays.max() <= 1
    # projection tuple camera
    assert s.proj is not None and len(s.proj) == 4
    M_ndc, M_uv, shift, scale = s.proj
    assert M_ndc.shape == (4, 4) and M_uv.shape == (4, 4)
    # OpenGL camera looks down -z: ray dirs have negative z
    assert np.all(s.directions[:, 2] < 0)
    np.testing.assert_allclose(
        np.linalg.norm(s.directions, axis=-1), 1.0, atol=1e-5)
    assert set(np.unique(s.labels["semantics_WF"])) <= {1, 2, 3}
    # depth: NaN zeroed, converted meters->asset units, rescaled
    assert np.isfinite(s.labels["depth"]).all()
    # scene normalized by the pointcloud bounds; cameras may sit slightly
    # outside the unit cube (they are not part of the pointcloud)
    assert np.abs(s.poses[:, :, 3]).max() <= 1.0


def test_hypersim_tonemap_properties():
    from normal_clustering_nerf_tpu.datasets.hypersim import tonemap_ccir601
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 4, (32, 32, 3)).astype(np.float32)
    ent = np.ones((32, 32), np.int32)
    out = tonemap_ccir601(rgb, ent)
    assert out.min() >= 0 and out.max() <= 1
    # the 90th-percentile brightness lands near the 0.8 target
    bright = 0.3 * out[..., 0] + 0.59 * out[..., 1] + 0.11 * out[..., 2]
    assert abs(np.percentile(bright, 90) - 0.8) < 0.15
    # all-invalid -> scale 1 path doesn't crash
    out2 = tonemap_ccir601(rgb, -np.ones((32, 32), np.int32))
    assert np.isfinite(out2).all()


def test_standard_cam_matches_published_form():
    from normal_clustering_nerf_tpu.datasets.hypersim import standard_cam_matrices
    M_uv, M_proj = standard_cam_matrices(1024, 768)
    # values for ai_001_001 in the published CSV
    np.testing.assert_allclose(M_uv[0, 0], 0.57735029, rtol=1e-6)
    np.testing.assert_allclose(M_uv[1, 1], 0.43301272, rtol=1e-6)
    np.testing.assert_allclose(M_proj[0, 0], 1.73205075, rtol=1e-6)
    np.testing.assert_allclose(M_proj[2, 2], -1.002002002, rtol=1e-6)
    np.testing.assert_allclose(M_proj[2, 3], -2.002002002, rtol=1e-6)
