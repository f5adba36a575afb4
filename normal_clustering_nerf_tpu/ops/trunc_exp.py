"""Gradient-clamped activations.

trunc_exp — reference: models/custom_functions.py:162-173 (TruncExp):
forward is exp(x); backward multiplies by exp(clamp(x, -15, 15)) to
bound the gradient scale of the density activation.

trunc_sigmoid — same philosophy applied to the rgb/tonemapper heads'
sigmoid: forward is exact sigmoid(x); backward evaluates sigmoid' at
clamp(x, -10, 10) so the gradient never underflows to exactly zero.
Why this exists: early in budgeted-march training rendered opacity is
low, the white/random background dominates every prediction, and the
resulting persistent "darker" gradient walks the bias-free color MLP's
pre-activations to ~-60 where float32 sigmoid' is EXACTLY 0 — the
color head dies permanently and training converges to a grayscale
(1-opacity)*bg rendering (round-4 diagnosis: 16.4 dB plateau,
channel-std identically 0, c(x) ~ 1e-28). The reference's unbounded
march (raymarching.cu:166-332) starts at ~0.8 opacity under the dense
warmup grid and never meets this regime; the clamp makes saturation
recoverable instead of terminal at any march budget.
"""
import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _fwd(x):
    return jnp.exp(x), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)


@jax.custom_vjp
def trunc_sigmoid(x):
    return jax.nn.sigmoid(x)


def _sig_fwd(x):
    return jax.nn.sigmoid(x), x


def _sig_bwd(x, g):
    s = jax.nn.sigmoid(jnp.clip(x, -10.0, 10.0))
    return (g * s * (1.0 - s),)


trunc_sigmoid.defvjp(_sig_fwd, _sig_bwd)
