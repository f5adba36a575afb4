"""Semantics tests for the C++ host-side batch prefetcher against the
on-device sampler's invariants."""
import numpy as np
import pytest

from normal_clustering_nerf_tpu.datasets.native_sampler import NativeRaySampler


@pytest.fixture(scope="module")
def scene_arrays():
    rng = np.random.default_rng(0)
    n_img, H, W = 4, 24, 32
    rgb = rng.random((n_img, H * W, 3)).astype(np.float32)
    depth = rng.random((n_img, H * W)).astype(np.float32)
    sem = rng.integers(0, 4, (n_img, H * W)).astype(np.int32)
    return (W, H), rgb, depth, sem


def test_uniform_strategy_gathers_correctly(scene_arrays):
    img_wh, rgb, depth, sem = scene_arrays
    s = NativeRaySampler("all_images", 256, img_wh, rgb, depth=depth,
                         semantics=sem, seed=7)
    b = s.next_batch()
    s.close()
    W, H = img_wh
    assert b["img_idxs"].shape == (256,)
    assert (b["img_idxs"] >= 0).all() and (b["img_idxs"] < rgb.shape[0]).all()
    assert (b["pix_idxs"] >= 0).all() and (b["pix_idxs"] < W * H).all()
    # gathered values match the source arrays exactly
    np.testing.assert_array_equal(
        b["rgb"], rgb[b["img_idxs"], b["pix_idxs"]])
    np.testing.assert_array_equal(
        b["depth"], depth[b["img_idxs"], b["pix_idxs"]])
    np.testing.assert_array_equal(
        b["semantics"], sem[b["img_idxs"], b["pix_idxs"]])


def test_triang_strategy_structure(scene_arrays):
    img_wh, rgb, depth, sem = scene_arrays
    W, H = img_wh
    s = NativeRaySampler("all_images_triang", 192, img_wh, rgb, seed=3)
    b = s.next_batch()
    s.close()
    pix = b["pix_idxs"].reshape(-1, 3)
    img = b["img_idxs"].reshape(-1, 3)
    # same image within a triangle (base.py:105-111)
    assert (img == img[:, :1]).all()
    # x2 directly above x1, x3 directly left of x1 (base.py:27-33)
    x1, x2, x3 = pix[:, 0], pix[:, 1], pix[:, 2]
    np.testing.assert_array_equal(x2, x1 - W)
    np.testing.assert_array_equal(x3, x1 - 1)
    # x1 in the interior
    assert (x1 // W >= 1).all() and (x1 // W <= H - 2).all()
    assert (x1 % W >= 1).all() and (x1 % W <= W - 2).all()


def test_patch_strategy_structure(scene_arrays):
    img_wh, rgb, depth, sem = scene_arrays
    W, H = img_wh
    p = 8
    s = NativeRaySampler("same_image_triang_patch", 2 * p * p, img_wh, rgb,
                         patch_size=p, seed=5)
    b = s.next_batch()
    s.close()
    assert (b["img_idxs"] == b["img_idxs"][0]).all()
    pix = b["pix_idxs"].reshape(-1, p * p)
    for row in pix:
        corner = row[0]
        expect = (corner + (np.arange(p * p) // p) * W
                  + (np.arange(p * p) % p))
        np.testing.assert_array_equal(row, expect)
        # patch fully inside the image
        assert corner % W + p <= W and corner // W + p <= H


def test_deterministic_given_seed(scene_arrays):
    img_wh, rgb, depth, sem = scene_arrays
    batches = []
    for _ in range(2):
        s = NativeRaySampler("all_images", 128, img_wh, rgb, seed=42,
                             n_threads=1)
        batches.append(s.next_batch())
        s.close()
    np.testing.assert_array_equal(batches[0]["pix_idxs"], batches[1]["pix_idxs"])
    np.testing.assert_array_equal(batches[0]["img_idxs"], batches[1]["img_idxs"])


def test_prefetch_throughput(scene_arrays):
    img_wh, rgb, depth, sem = scene_arrays
    s = NativeRaySampler("all_images_triang", 768, img_wh, rgb, depth=depth,
                         n_threads=4, seed=1)
    for _ in range(50):
        b = s.next_batch()
        assert b["rgb"].shape == (768, 3)
    s.close()
