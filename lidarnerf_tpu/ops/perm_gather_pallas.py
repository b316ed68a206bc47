"""MXU permutation gather: per-ray sort-merge reordering as a matmul.

The sort-merge step of the renderer (reference renderer.py:217-231) reorders
[N, S, C] per-sample arrays by a per-ray permutation. XLA's gather unit runs
this at ~30M rows/s (~112 ms per direction at step scale — the largest
non-encode cost of the training step). This kernel instead builds the one-hot
permutation matrix T (T[j, i] = 1 iff sorted slot j takes source i) in VMEM
and applies it on the MXU: ``out = T @ vals`` — ~780 GFLOP bf16 per training
step, ~4 ms.

Exactness: a permutation matmul never *adds* two nonzero products, it only
*selects* — so bf16 multiply-accumulate passes values through unchanged. To
move full f32 values through bf16 lanes, each channel's *bit pattern* is
split into four 8-bit integer planes (each value in [0, 255] is exactly
representable in bf16), gathered in one fused matmul, and bit-reassembled —
the gather is **bit-exact** (tested). An arithmetic hi/mid/lo bf16 split
does NOT survive on hardware: XLA's excess-precision simplification folds
``x - f32(bf16(x))`` to zero, silently truncating the payload to bf16.

The backward pass of a permutation gather is the gather by the inverse
permutation, i.e. ``Tᵀ @ g`` — the same kernel with the one-hot comparison
transposed; both directions are built from ``inv_order`` alone
(inv_order = argsort(order), with order = argsort(z)).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 8


def _kernel(inv_ref, vals_ref, out_ref, m_ref, *, transpose):
    """One grid step gathers RAY_BLOCK rays.

    inv_ref: [RB, S] int32 — inverse permutation (src -> sorted slot).
    vals_ref/out_ref: [RB, S, C4] bf16 (C4 = 4 * channels, lane-padded).
    m_ref: [S, S] bf16 scratch for the one-hot matrix.
    """
    S = inv_ref.shape[1]
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    for r in range(inv_ref.shape[0]):
        inv_row = inv_ref[r : r + 1, :]  # [1, S]
        if not transpose:
            # forward: T[j, i] = (inv[i] == j); inv broadcast along sublanes
            m_ref[:] = (iota_sub == inv_row).astype(jnp.bfloat16)
        else:
            # backward: Tᵀ[i, j] = (inv[i] == j); inv on sublanes
            inv_col = jnp.transpose(inv_row, (1, 0))  # [S, 1]
            m_ref[:] = (iota_lane == inv_col).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            m_ref[:],
            vals_ref[r],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[r] = acc.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("transpose", "interpret"))
def _apply(vals, inv_order, transpose, interpret):
    """vals: [N, S, C] f32; inv_order: [N, S] int32 -> gathered [N, S, C] f32."""
    N, S, C = vals.shape
    # bit-plane split: f32 bits -> four bf16-exact bytes (see module doc)
    u = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    planes = [((u >> shift) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
              for shift in (24, 16, 8, 0)]
    packed = jnp.concatenate(planes, axis=-1)  # [N, S, 4C] bf16

    pad = (-N) % RAY_BLOCK
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0), (0, 0)))
        inv_order = jnp.pad(
            inv_order,
            ((0, pad), (0, 0)),
            mode="constant",
            constant_values=0,
        )
        # identity permutation for pad rays keeps the one-hot well-formed
        iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (pad, S))
        inv_order = inv_order.at[N:].set(iota)
    Np = N + pad

    out = pl.pallas_call(
        functools.partial(_kernel, transpose=transpose),
        grid=(Np // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (RAY_BLOCK, S, 4 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (RAY_BLOCK, S, 4 * C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Np, S, 4 * C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((S, S), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(inv_order, packed)

    out = out[:N]
    # bit-reassembly: each plane holds exact integers in [0, 255]
    acc = jnp.zeros((N, S, C), jnp.uint32)
    for k, shift in enumerate((24, 16, 8, 0)):
        byte = out[..., k * C : (k + 1) * C].astype(jnp.uint32)
        acc = acc | (byte << shift)
    return jax.lax.bitcast_convert_type(acc, jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mxu_permutation_gather(vals, inv_order, interpret=False):
    """take_along_axis(vals, argsort-inverse-of(inv_order), axis=1) on the MXU.

    Drop-in for the sort-merge reorder: out[n, j] = vals[n, order[n, j]] where
    inv_order = argsort(order). Differentiable in ``vals`` (the VJP is the
    inverse gather, run through the same kernel transposed).
    """
    return _apply(vals, inv_order, False, interpret)


def _fwd(vals, inv_order, interpret):
    return _apply(vals, inv_order, False, interpret), inv_order


def _bwd(interpret, inv_order, g):
    return _apply(g, inv_order, True, interpret), None


mxu_permutation_gather.defvjp(_fwd, _bwd)
