"""Hash-encoding golden parity and NGP-MT model shape/gradient tests."""
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.config import ModelConfig
from normal_clustering_nerf_tpu.models import NGPMT, HashGridSpec, hash_encode, init_hash_table
from normal_clustering_nerf_tpu.models.hash_encoding import hash_encode_reference_np
from normal_clustering_nerf_tpu.models.sh_encoding import sh_encode_deg4


def test_hash_grid_spec_matches_reference_constants():
    cfg = ModelConfig(scale=0.5)
    # reference: models/ngp_mt.py:40-41 with scale=0.5:
    # b = exp(ln(2048*0.5/16)/15)
    assert abs(cfg.per_level_scale - np.exp(np.log(64.0) / 15.0)) < 1e-12
    spec = HashGridSpec.create(per_level_scale=cfg.per_level_scale)
    assert spec.n_levels == 16 and spec.n_features == 2
    assert spec.resolutions[0] == 16
    # coarse levels are dense (res^3 < 2^19), fine levels hashed
    assert spec.dense[0] and not spec.dense[-1]


def test_hash_encode_matches_numpy_oracle(rng):
    spec = HashGridSpec.create(n_levels=6, log2_table_size=12, base_res=4,
                               per_level_scale=1.5)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, spec)
    x = jnp.asarray(rng.random((128, 3)).astype(np.float32))
    out = np.asarray(hash_encode(table, x, spec))
    ref = hash_encode_reference_np(table, x, spec)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-7)


def test_hash_encode_custom_vjp_matches_autodiff(rng):
    """The TPU-shaped custom backward must match plain autodiff of the
    forward implementation (table and position gradients)."""
    from normal_clustering_nerf_tpu.models.hash_encoding import (
        _hash_encode_fwd_impl, hash_encode_vjp,
    )
    spec = HashGridSpec.create(n_levels=5, log2_table_size=10, base_res=4,
                               per_level_scale=1.6)
    table = init_hash_table(jax.random.PRNGKey(3), spec)
    x = jnp.asarray(rng.random((64, 3)).astype(np.float32)) * 0.98 + 0.01
    g_out = jnp.asarray(rng.standard_normal(
        (64, spec.n_levels * spec.n_features)).astype(np.float32))

    def loss_ref(t, xx):
        return jnp.sum(_hash_encode_fwd_impl(t, xx, spec) * g_out)

    def loss_vjp(t, xx):
        return jnp.sum(hash_encode_vjp(t, xx, spec, True) * g_out)

    gt_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(table, x)
    gt_vjp, gx_vjp = jax.grad(loss_vjp, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(gt_vjp, gt_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(gx_vjp, gx_ref, rtol=1e-3, atol=1e-5)


def test_hash_encode_dedupe_path_matches_autodiff(rng):
    """Ray-coherent positions engage the run-dedupe scatter path in the
    custom backward; gradients must stay exact."""
    from normal_clustering_nerf_tpu.models.hash_encoding import (
        _hash_encode_fwd_impl, hash_encode_vjp,
    )
    spec = HashGridSpec.create(n_levels=4, log2_table_size=12, base_res=4,
                               per_level_scale=2.0)
    table = init_hash_table(jax.random.PRNGKey(5), spec)
    # marching-like samples: few rays, many tiny steps -> long runs
    o = rng.random((4, 3)).astype(np.float32) * 0.2 + 0.1
    d = rng.standard_normal((4, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0, 0.5, 64, dtype=np.float32)
    x = jnp.asarray(
        (o[:, None, :] + t[None, :, None] * d[:, None, :]).reshape(-1, 3))
    x = jnp.clip(x, 0.01, 0.99)
    g_out = jnp.asarray(rng.standard_normal(
        (x.shape[0], spec.n_levels * spec.n_features)).astype(np.float32))

    gt_ref = jax.grad(
        lambda tt: jnp.sum(_hash_encode_fwd_impl(tt, x, spec) * g_out))(table)
    gt_vjp = jax.grad(
        lambda tt: jnp.sum(hash_encode_vjp(tt, x, spec, False) * g_out))(table)
    np.testing.assert_allclose(gt_vjp, gt_ref, rtol=1e-4, atol=1e-7)


def test_hash_encode_grad_scatters_to_table():
    spec = HashGridSpec.create(n_levels=4, log2_table_size=10, base_res=4,
                               per_level_scale=1.5)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.default_rng(1).random((32, 3)).astype(np.float32))
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec) ** 2))(table)
    assert g.shape == table.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_ngp_mt_forward_shapes_and_heads():
    cfg = ModelConfig(scale=0.5, pred_sem=True, pred_norm_nn=True, n_sem_cls=3)
    model = NGPMT(cfg)
    params = model.init(jax.random.PRNGKey(0))
    M = 64
    x = jnp.zeros((M, 3))
    d = jnp.concatenate([jnp.ones((M, 1)), jnp.zeros((M, 2))], axis=1)
    out = model(params, x, d)
    assert out["sigmas"].shape == (M,)
    assert out["rgbs"].shape == (M, 3)
    assert out["sems"].shape == (M, 3)
    assert out["norms"].shape == (M, 3)
    assert np.all(np.asarray(out["sigmas"]) > 0)          # trunc_exp output
    assert np.all((np.asarray(out["rgbs"]) >= 0) & (np.asarray(out["rgbs"]) <= 1))


def test_ngp_mt_density_grad_finite():
    cfg = ModelConfig(scale=0.5)
    model = NGPMT(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (16, 3)).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(model.density(p, x)))(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)


def test_sh_encoding_orthonormality(rng):
    """SH basis functions should be orthonormal under the sphere measure."""
    M = 200000
    v = rng.standard_normal((M, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode_deg4(jnp.asarray(v)))
    gram = (Y.T @ Y) / M * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)
