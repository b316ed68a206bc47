"""Truncated exponential activation.

TPU-native equivalent of the reference's `_trunc_exp` autograd Function
(/root/reference/lidarnerf/activation.py:6-20): forward is exp computed in
float32; the backward pass clamps the *saved input* to [-15, 15] before
exponentiating so that gradients never overflow, which stabilises density
training under mixed precision.

One deliberate deviation: the forward input is clipped at 80 (exp(80) =
5.5e34, still f32-finite) where the reference leaves it unbounded. An
unbounded forward can return inf once a converging surface pushes a density
logit past 88.7, and the first duplicate sample depth then feeds compositing
`delta * sigma = 0 * inf = NaN`, which detonated full-config KITTI training
around step ~170 (reproduced twice on v5e). Every alpha with sigma >= e^80
is already saturated at exactly 1.0 for any representable delta, so the clip
is invisible below the overflow regime.
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    x = jnp.asarray(x, jnp.float32)
    return jnp.exp(jnp.minimum(x, 80.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    x = jnp.asarray(x, jnp.float32)
    y = jnp.exp(jnp.minimum(x, 80.0))
    dy = jnp.asarray(dx, jnp.float32) * jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, dy
