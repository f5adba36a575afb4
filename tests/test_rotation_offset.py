"""End-to-end R_offset wiring: rotated scene -> clustering recovery.

Covers the reference's rotation-offset ablation path
(reference: train_nerf.py:109-122 builds R_offset from
loss_norm_*_offset_ang; datasets/hypersim.py:82-95 rotates poses and
normal labels; train_nerf.py:489-528 recovers the rotation from
clustered depth-normals at validation).
"""
import jax
import numpy as np
import pytest

from normal_clustering_nerf_tpu.datasets.synthetic import SyntheticDataset
from normal_clustering_nerf_tpu.training.rotation_recovery import (
    rotation_recovery_errors,
)
from normal_clustering_nerf_tpu.utils.rotations import (
    R_offset_from_angles, euler_angles_to_matrix,
)


def test_r_offset_from_angles():
    assert R_offset_from_angles(0, 0, 0) is None
    R = R_offset_from_angles(30, 0, 0)
    exp = euler_angles_to_matrix(np.array([np.pi / 6, 0, 0]), "ZYX")
    np.testing.assert_allclose(R, exp, atol=1e-6)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_synthetic_r_offset_rotates_scene():
    base = SyntheticDataset(split="train", img_wh=(32, 32), n_images=4).load()
    R = R_offset_from_angles(30, 0, 0)
    rot = SyntheticDataset(split="train", img_wh=(32, 32), n_images=4,
                           R_offset=R).load()
    # images unchanged (captured pixels stay fixed)
    np.testing.assert_allclose(rot.rays, base.rays)
    # poses rotated + 1.6-shrunk translations (hypersim.py:83-88)
    np.testing.assert_allclose(
        rot.poses[:, :, :3], np.einsum("ij,njk->nik", R, base.poses[:, :, :3]),
        atol=1e-5)
    np.testing.assert_allclose(
        rot.poses[:, :, 3], base.poses[:, :, 3] @ R.T / 1.6, atol=1e-5)
    # normal labels rotated, depth rescaled
    np.testing.assert_allclose(
        rot.labels["normals"].reshape(-1, 3),
        base.labels["normals"].reshape(-1, 3) @ R.T, atol=1e-5)
    np.testing.assert_allclose(
        rot.labels["depth"], base.labels["depth"] / 1.6, atol=1e-6)


def _noisy(normals, sigma=0.03, seed=0):
    """GT normals are 6 exact points — degenerate for k-means; perturb
    like real depth-normals so clusters are blobs."""
    rng = np.random.default_rng(seed)
    n = normals + rng.normal(0, sigma, normals.shape)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


@pytest.mark.parametrize("yaw,pitch", [(30.0, 0.0), (20.0, 10.0)])
def test_rotation_recovery_from_rotated_gt_normals(yaw, pitch):
    """Clustering the rotated scene's depth-normals must recover
    R_offset to within ~a degree."""
    R = R_offset_from_angles(yaw, pitch, 0.0)
    ds = SyntheticDataset(split="train", img_wh=(48, 48), n_images=6,
                          R_offset=R).load()
    normals = _noisy(ds.labels["normals_depth"].reshape(-1, 3))
    errs = rotation_recovery_errors(normals, R, jax.random.PRNGKey(3))
    for k, v in errs.items():
        assert v < 3.0, (k, v, errs)


def test_rotation_recovery_identity_without_offset():
    ds = SyntheticDataset(split="train", img_wh=(48, 48), n_images=6).load()
    normals = _noisy(ds.labels["normals_depth"].reshape(-1, 3))
    errs = rotation_recovery_errors(
        normals, np.eye(3, dtype=np.float32), jax.random.PRNGKey(7))
    for k, v in errs.items():
        assert v < 3.0, (k, v, errs)


def test_rotation_recovery_handles_left_handed_triples(rng):
    """The dominant-centroid triple's handedness is a fair coin per
    k-means draw (wall normals fix axis directions only up to sign);
    SVD-projecting an improper triple used to produce a ~40 deg frame
    (r5 bug). Recovery must be accurate for EVERY draw."""
    import jax

    from normal_clustering_nerf_tpu.training.rotation_recovery import (
        rotation_recovery_errors,
    )

    # room-like population: three orthogonal axis families with noise,
    # mixed signs (inward-facing walls), unequal sizes
    axes = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, 0, 1], [0, 0, -1]], np.float64)
    counts = [4000, 3000, 2500, 3500, 2000]
    pts = []
    for a, c in zip(axes, counts):
        v = a[None, :] + 0.08 * rng.standard_normal((c, 3))
        pts.append(v / np.linalg.norm(v, axis=-1, keepdims=True))
    normals = np.concatenate(pts).astype(np.float32)
    for seed in range(6):  # several draws: both handedness outcomes
        out = rotation_recovery_errors(
            normals, np.eye(3, dtype=np.float32), jax.random.PRNGKey(seed))
        for k, v in out.items():
            # the bug regime was 20-40 deg; ~5 deg is genuine centroid
            # estimation error at this noise level (0.08 rad ~ 4.6 deg)
            assert v < 8.0, (seed, k, v)


def test_rotation_recovery_degenerate_normals_raise_cleanly():
    """All-zero normals (untrained --val_only validate) must raise the
    ValueError that trainer.validate() catches and logs as
    ang/clust/failed — r5 regression: a None frame reached the column
    matcher and crashed validate with a TypeError."""
    import jax
    import pytest

    from normal_clustering_nerf_tpu.training.rotation_recovery import (
        rotation_recovery_errors,
    )

    normals = np.zeros((5000, 3), np.float32)
    with pytest.raises(ValueError):
        rotation_recovery_errors(normals, np.eye(3, dtype=np.float32),
                                 jax.random.PRNGKey(0))
