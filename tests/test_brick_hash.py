"""Brick-hash encoding: numpy-oracle parity, custom-VJP correctness.

The brick layout (models/brick_hash.py) is this framework's TPU-fast
hash-grid: same trilinear math as tcnn's grid, table rows regrouped
into 4^3-vertex bricks so the backward is one aligned row scatter per
level. These tests pin the math against a scalar-explicit numpy oracle
and the custom VJP against plain autodiff of the forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models.brick_hash import (
    BrickGridSpec, _brick_encode_impl, brick_encode, brick_encode_vjp,
    brick_encode_reference_np, init_brick_table,
)
from normal_clustering_nerf_tpu.models.ngp_mt import NGPMT


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _spec_small():
    # mixes dense levels (coarse) and hashed levels (fine)
    return BrickGridSpec.create(n_levels=6, log2_bricks=8, base_res=4,
                                per_level_scale=2.0)


def test_brick_encode_matches_numpy_oracle(rng):
    spec = _spec_small()
    assert any(spec.dense) and not all(spec.dense)
    table = jnp.asarray(
        rng.standard_normal(spec.table_shape(), dtype=np.float32))
    x = jnp.asarray(rng.random((257, 3), dtype=np.float32))
    out = np.asarray(brick_encode(table, x, spec))
    ref = brick_encode_reference_np(table, x, spec)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_brick_encode_boundary_positions(rng):
    spec = _spec_small()
    table = jnp.asarray(
        rng.standard_normal(spec.table_shape(), dtype=np.float32))
    # exact 0/1 corners and brick-stride boundaries
    xs = np.array([
        [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.5],
        [3 / 7, 3 / 7, 6 / 7], [0.999999, 1e-7, 0.5],
    ], np.float32)
    out = np.asarray(brick_encode(table, jnp.asarray(xs), spec))
    ref = brick_encode_reference_np(table, xs, spec)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert np.all(np.isfinite(out))


def test_brick_custom_vjp_matches_autodiff(rng):
    spec = _spec_small()
    table = jnp.asarray(
        rng.standard_normal(spec.table_shape(), dtype=np.float32))
    x = jnp.asarray(rng.random((64, 3), dtype=np.float32) * 0.98 + 0.01)
    g_out = jnp.asarray(rng.standard_normal(
        (64, spec.n_levels * spec.n_features), dtype=np.float32))

    def loss_raw(t, xx):
        return jnp.sum(_brick_encode_impl(t, xx, spec) * g_out)

    def loss_vjp(t, xx):
        return jnp.sum(brick_encode_vjp(t, xx, spec, True) * g_out)

    gt_raw, gx_raw = jax.grad(loss_raw, argnums=(0, 1))(table, x)
    gt_vjp, gx_vjp = jax.grad(loss_vjp, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_vjp), np.asarray(gt_raw),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_vjp), np.asarray(gx_raw),
                               rtol=1e-4, atol=2e-4)


def test_brick_grad_row_structure(rng):
    """Each sample's table gradient hits exactly one brick row per level."""
    spec = _spec_small()
    table = init_brick_table(jax.random.PRNGKey(0), spec)
    x = jnp.asarray([[0.37, 0.51, 0.93]], dtype=np.float32)
    g = jax.grad(lambda t: jnp.sum(brick_encode(t, x, spec)))(table)
    g = np.asarray(g)
    for l in range(spec.n_levels):
        nz_rows = np.unique(np.nonzero(np.abs(g[l]).sum(-1))[0])
        assert len(nz_rows) == 1, f"level {l}: {nz_rows}"
        # trilinear weights sum to 1 per feature column within the row
        row = g[l, nz_rows[0]].reshape(64, spec.n_features)
        np.testing.assert_allclose(row.sum(0), 1.0, rtol=1e-5)


def test_ngpmt_brick_layout_end_to_end(rng):
    cfg = ModelConfig(scale=0.5, hash_layout="brick", log2_bricks=7,
                      n_levels=4, base_resolution=4,
                      pred_sem=True, pred_norm_nn=True, n_sem_cls=3)
    model = NGPMT(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert params["hash_table"].shape == (4, 128, 128)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (33, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((33, 3)).astype(np.float32))
    out = model(params, x, d)
    assert out["sigmas"].shape == (33,)
    assert out["rgbs"].shape == (33, 3)
    assert np.all(np.isfinite(np.asarray(out["rgbs"])))
    g = jax.grad(
        lambda p: jnp.sum(model(p, x, d)["rgbs"])
    )(params)
    assert np.any(np.asarray(g["hash_table"]) != 0)
