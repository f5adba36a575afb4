"""Closed-form checks of the even-rank stratified sample budget
(ops/ray_march.py stratified_budget): slot utilisation, span
conservation, exactness when the occupied count fits the budget.
"""
import numpy as np
import jax.numpy as jnp

from normal_clustering_nerf_tpu.ops.ray_march import stratified_budget


def _row(occ_cols, S):
    inc = np.zeros((1, S), bool)
    inc[0, occ_cols] = True
    return jnp.asarray(inc)


def test_exact_when_fits():
    S, K = 32, 8
    inc = _row(np.arange(0, 12, 2), S)  # M = 6 <= K
    sel, span = stratified_budget(inc, K, tail_k=K)
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(inc))
    assert np.all(np.asarray(span)[np.asarray(sel)] == 1)


def test_first_k_when_tail_zero():
    S, K = 32, 4
    inc = _row(np.arange(10), S)
    sel, span = stratified_budget(inc, K, tail_k=0)
    expect = np.zeros((1, S), bool)
    expect[0, :K] = True
    np.testing.assert_array_equal(np.asarray(sel), expect)
    assert np.all(np.asarray(span) == 1)


def test_all_slots_used_and_spans_conserve():
    """ADVICE r3 low#3/#4: for ANY M > K the selection must fill all K
    slots (no stride-quantisation cliff at M = K+1) and the selected
    spans must sum exactly to the occupied count (no final-group
    over-integration)."""
    S, K = 256, 16
    rng = np.random.default_rng(0)
    for M in [K + 1, K + 2, 2 * K - 1, 2 * K, 3 * K + 5, 200]:
        cols = np.sort(rng.choice(S, M, replace=False))
        inc = _row(cols, S)
        sel, span = stratified_budget(inc, K, tail_k=K)
        sel_np, span_np = np.asarray(sel)[0], np.asarray(span)[0]
        assert sel_np.sum() == K, (M, sel_np.sum())
        assert span_np[sel_np].sum() == M, (M, span_np[sel_np].sum())
        # every selected sample represents >= 1 occupied step
        assert np.all(span_np[sel_np] >= 1)


def test_head_verbatim_tail_strided():
    """tail_k < K: the first K - tail_k occupied steps are verbatim
    (span 1), tail slots evenly cover the rest."""
    S, K, tail = 128, 12, 4
    M = 60
    cols = np.arange(M)
    inc = _row(cols, S)
    sel, span = stratified_budget(inc, K, tail_k=tail)
    sel_np, span_np = np.asarray(sel)[0], np.asarray(span)[0]
    K1 = K - tail
    # head verbatim
    assert np.all(sel_np[:K1])
    assert np.all(span_np[:K1] == 1)
    # exactly `tail` tail picks, spans conserve the remaining extent
    assert sel_np.sum() == K
    assert span_np[sel_np][K1:].sum() == M - K1
    # last occupied step is always represented (the far wall keeps
    # receiving gradient)
    assert sel_np[M - 1]
