"""Truncated exponential activation.

TPU-native equivalent of the reference's `_trunc_exp` autograd Function
(/root/reference/lidarnerf/activation.py:6-20): forward is a plain exp computed
in float32; the backward pass clamps the *saved input* to [-15, 15] before
exponentiating so that gradients never overflow, which stabilises density
training under mixed precision.
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    x = jnp.asarray(x, jnp.float32)
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    x = jnp.asarray(x, jnp.float32)
    y = jnp.exp(x)
    dy = jnp.asarray(dx, jnp.float32) * jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, dy
