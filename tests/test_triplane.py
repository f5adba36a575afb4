"""Triplane + coarse-grid encoding: oracle parity, gradients, learning.

The triplane field (models/triplane.py) is the TPU-fast alternative to
the hash grid — 4 gather indices per sample instead of 16. These tests
pin its math to a scalar-explicit numpy oracle, check the custom-VJP
table/position gradients against autodiff of the oracle-equivalent
forward, and verify the full NGP-MT model learns with it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from normal_clustering_nerf_tpu.models.triplane import (
    TriplaneSpec, _encode_impl, init_triplane, triplane_encode,
    triplane_encode_reference_np,
)


def _spec():
    return TriplaneSpec.create(plane_res=65, plane_feats=8,
                               grid3d_res=17, grid3d_feats=4)


def test_triplane_matches_numpy_oracle(rng):
    spec = _spec()
    params = init_triplane(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(1), p.shape), params)
    x = jnp.asarray(rng.random((257, 3)).astype(np.float32))
    out = triplane_encode(params, x, spec)
    ref = triplane_encode_reference_np(params, x, spec)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_triplane_table_grads_match_autodiff(rng):
    spec = _spec()
    params = init_triplane(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda p: 0.1 * jax.random.normal(jax.random.PRNGKey(2), p.shape),
        params)
    x = jnp.asarray(rng.random((64, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((64, spec.out_dim)).astype(np.float32))

    def loss_vjp(p):
        return jnp.sum(triplane_encode(p, x, spec) * g)

    def loss_auto(p):
        return jnp.sum(_encode_impl(p, x, spec) * g)

    g_vjp = jax.grad(loss_vjp)(params)
    g_auto = jax.grad(loss_auto)(params)
    for k in ("planes", "grid3d"):
        np.testing.assert_allclose(
            np.asarray(g_vjp[k]), np.asarray(g_auto[k]),
            rtol=1e-4, atol=1e-6, err_msg=k)


def test_triplane_position_grads(rng):
    spec = _spec()
    params = init_triplane(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda p: 0.1 * jax.random.normal(jax.random.PRNGKey(3), p.shape),
        params)
    # keep away from cell boundaries where the interpolant is non-smooth
    x0 = jnp.asarray((rng.integers(2, 60, (32, 3)) + 0.43).astype(np.float32)
                     / 64.0)
    g = jnp.asarray(rng.standard_normal((32, spec.out_dim)).astype(np.float32))

    def f(x):
        return jnp.sum(triplane_encode(params, x, spec, need_dx=True) * g)

    dx = jax.grad(f)(x0)
    eps = 1e-4
    for axis in range(3):
        e = jnp.zeros((1, 3)).at[0, axis].set(eps)
        fd = (f(x0 + e) - f(x0 - e)) / (2 * eps)
        np.testing.assert_allclose(
            float(jnp.sum(dx[:, axis])), float(fd), rtol=2e-2, atol=1e-3)


def test_ngpmt_triplane_learns(rng):
    """Full model with hash_layout='triplane' fits a toy radiance field."""
    import optax

    from normal_clustering_nerf_tpu.config import ModelConfig
    from normal_clustering_nerf_tpu.models import NGPMT

    cfg = ModelConfig(scale=0.5, grid_size=16, max_samples=64,
                      hash_layout="triplane", plane_res=33, grid3d_res=9)
    model = NGPMT(cfg)
    params = model.init(jax.random.PRNGKey(0))

    x = jnp.asarray(rng.uniform(-0.45, 0.45, (512, 3)).astype(np.float32))
    d = rng.standard_normal((512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    target_rgb = jnp.asarray(
        (np.sin(7 * np.asarray(x)) * 0.5 + 0.5).astype(np.float32))
    target_sig = jnp.exp(2.0 * x[:, 0])

    tx = optax.adam(1e-2, eps=1e-15)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss(p):
            out = model(p, x, d)
            return (jnp.mean((out["rgbs"] - target_rgb) ** 2)
                    + jnp.mean((out["sigmas"] - target_sig) ** 2))
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, l

    params2, opt, l0 = step(params, opt)
    for _ in range(150):
        params2, opt, l = step(params2, opt)
    assert float(l) < 0.5 * float(l0), (float(l0), float(l))


def test_layout_conversion_v1_to_v2(rng):
    """A slot-major (v1) table permuted by the converter must encode
    identically to the feature-major (v2) original (r4 advisor:
    param shapes are layout-invariant, so restores of pre-change
    checkpoints would otherwise silently scramble features)."""
    from normal_clustering_nerf_tpu.models.triplane import (
        convert_triplane_params_v1_to_v2,
    )
    spec = _spec()
    params_v2 = init_triplane(jax.random.PRNGKey(3), spec)
    # build the v1 (slot-major) version of the same table: inverse of
    # the converter's (F, S) -> lanes transpose
    def to_v1(rows, S):
        R, FS = np.asarray(rows).shape
        F = FS // S
        return np.asarray(rows).reshape(R, F, S).transpose(0, 2, 1).reshape(R, FS)
    params_v1 = {
        "planes": np.stack([to_v1(p, 16) for p in np.asarray(params_v2["planes"])]),
        "grid3d": to_v1(params_v2["grid3d"], 64),
    }
    upgraded = convert_triplane_params_v1_to_v2(params_v1)
    np.testing.assert_array_equal(upgraded["planes"],
                                  np.asarray(params_v2["planes"]))
    np.testing.assert_array_equal(upgraded["grid3d"],
                                  np.asarray(params_v2["grid3d"]))
    x = jnp.asarray(rng.random((63, 3)).astype(np.float32))
    out_a = triplane_encode(jax.tree_util.tree_map(jnp.asarray, upgraded),
                            x, spec)
    out_b = triplane_encode(params_v2, x, spec)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6, atol=1e-7)


def test_checkpoint_layout_tag_roundtrip(tmp_path):
    """save_weights/load_weights tag + upgrade path: a v1 npz (no tag)
    with slot-major rows is permuted on load; a current npz is not."""
    from normal_clustering_nerf_tpu.training.checkpoints import (
        load_weights, save_weights,
    )
    spec = _spec()
    params = {"hash_table": init_triplane(jax.random.PRNGKey(4), spec)}
    p = str(tmp_path / "w.npz")
    save_weights(p, params)
    back = load_weights(p, jax.tree_util.tree_map(np.zeros_like, params))
    np.testing.assert_array_equal(back["hash_table"]["grid3d"],
                                  np.asarray(params["hash_table"]["grid3d"]))
    # simulate a pre-versioning artifact: strip the tag
    data = dict(np.load(p))
    data.pop("__triplane_layout__")
    np.savez(p, **data)
    back_v1 = load_weights(p, jax.tree_util.tree_map(np.zeros_like, params))
    # the untagged file is treated as slot-major and permuted
    from normal_clustering_nerf_tpu.models.triplane import (
        convert_triplane_params_v1_to_v2,
    )
    expect = convert_triplane_params_v1_to_v2(
        jax.tree_util.tree_map(np.asarray, params["hash_table"]))
    np.testing.assert_array_equal(back_v1["hash_table"]["grid3d"],
                                  expect["grid3d"])
