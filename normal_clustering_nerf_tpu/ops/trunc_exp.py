"""Exponential with gradient-clamped backward.

reference: models/custom_functions.py:162-173 (TruncExp): forward is
exp(x); backward multiplies by exp(clamp(x, -15, 15)) to bound the
gradient scale of the density activation.
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
