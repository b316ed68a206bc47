"""Fused MLP: the whole bias-free ReLU chain in one Pallas kernel.

Counterpart of the reference's ffmlp CUDA extension
(/root/reference/lidarnerf/ffmlp/src/ffmlp.cu kernel_mlp_fused:465-578 and
ffmlp.py:187-283) and of tcnn's FullyFusedMLP: weights stay resident in VMEM
while activations never leave the chip between layers. Like its CUDA twin it
is width-constrained (hidden dims that the MXU tiles cleanly); unlike it
there is no wmma scheduling to hand-roll — each layer is one `jnp.dot` on the
MXU with fp32 accumulation.

The reference's ffmlp is DORMANT on the main path (network.py uses plain
Linear layers; XLA fuses those well), and this kernel mirrors that status: it
is the inference fast path (`fused_mlp_inference`) plus a differentiable
wrapper whose backward recomputes activations (`fused_mlp`), available for
models that want it; training defaults to the XLA MLP.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024


def _on_tpu():
    from lidarnerf_tpu.ops.dispatch import on_tpu

    return on_tpu()


def _make_kernel(n_layers, final_activation):
    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        h = x_ref[:]
        for i in range(n_layers):
            h = jnp.dot(
                h.astype(w_refs[i].dtype),
                w_refs[i][:],
                preferred_element_type=jnp.float32,
            )
            if i != n_layers - 1:
                h = jnp.maximum(h, 0.0)
        if final_activation == "sigmoid":
            h = jax.nn.sigmoid(h)
        elif final_activation == "relu":
            h = jnp.maximum(h, 0.0)
        out_ref[:] = h.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("final_activation", "interpret"))
def fused_mlp_inference(x, weights, final_activation="none", interpret=False):
    """Run x [Q, din] through the weight chain in one kernel.

    Args:
        x: [Q, din] inputs.
        weights: list/tuple of [d_i, d_{i+1}] matrices (bias-free, ReLU
            between layers — the reference ffmlp/tcnn contract).
        final_activation: "none" | "relu" | "sigmoid".
    """
    weights = tuple(weights)
    n_layers = len(weights)
    Q = x.shape[0]
    pad = (-Q) % CHUNK
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    dout = weights[-1].shape[1]

    out = pl.pallas_call(
        _make_kernel(n_layers, final_activation),
        grid=((Q + pad) // CHUNK,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in weights],
        out_specs=pl.BlockSpec((CHUNK, dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q + pad, dout), jnp.float32),
        interpret=interpret,
    )(xp, *weights)
    return out[:Q]


def mlp_reference(x, weights, final_activation="none"):
    """Plain-XLA twin used for training and as the test oracle."""
    h = x
    for i, w in enumerate(weights):
        h = jnp.dot(h.astype(w.dtype), w, preferred_element_type=jnp.float32)
        if i != len(weights) - 1:
            h = jnp.maximum(h, 0.0)
    if final_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    elif final_activation == "relu":
        h = jnp.maximum(h, 0.0)
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp(x, weights, final_activation="none"):
    """Differentiable fused MLP: Pallas forward (on TPU), recompute backward."""
    if _on_tpu():
        return fused_mlp_inference(x, tuple(weights), final_activation)
    return mlp_reference(x, weights, final_activation)


def _fused_fwd(x, weights, final_activation):
    return fused_mlp(x, weights, final_activation), (x, tuple(weights))


def _fused_bwd(final_activation, res, g):
    x, weights = res
    _, vjp = jax.vjp(lambda xx, ww: mlp_reference(xx, ww, final_activation), x, weights)
    dx, dw = vjp(g)
    return dx, list(dw)


fused_mlp.defvjp(_fused_fwd, _fused_bwd)
