"""Time the training-step phases on the real chip to direct optimization.

Times, each jitted and block-until-ready over several iterations:
  - full train step (the bench.py program)
  - render forward only (no grad)
  - render forward + grad (no optimizer)
  - encode fwd kernel, encode fwd+bwd kernels at step scale
  - sort_merge permutation gather fwd and fwd+bwd at step scale
Prints a JSON dict of milliseconds.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
    """Each fn must return a device scalar; float() D2H is the completion
    barrier (block_until_ready returns early on the tunneled backend)."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    assert float(out) == float(out) or True
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from lidarnerf_tpu.models.network import NeRFNetwork
    from lidarnerf_tpu.models.renderer import RenderConfig, render_rays
    from lidarnerf_tpu.nerf.train_step import TrainConfig, make_optimizer, make_train_step
    from lidarnerf_tpu.ops import block_hash as bh
    from lidarnerf_tpu.ops import block_hash_pallas as bhp
    from lidarnerf_tpu.ops.sampling import permutation_gather

    H, W = 66, 1030
    NUM_RAYS, NUM_STEPS, UPSAMPLE = 4096, 768, 64
    S = NUM_STEPS + UPSAMPLE
    Q = NUM_RAYS * S

    module = NeRFNetwork(
        encoding="blockhash",
        desired_resolution=32768,
        log2_hashmap_size=19,
        bound=1.0,
        compute_dtype=jnp.bfloat16,
    )
    tcfg = TrainConfig(
        alpha_d=1000.0, alpha_i=10.0, alpha_grad=100.0, grad_loss=True,
        scale=0.0108, num_rays_lidar=NUM_RAYS, H_lidar=H, W_lidar=W,
        intrinsics_lidar=(2.0, 26.9), iters=30000,
    )
    rcfg = RenderConfig(
        num_steps=NUM_STEPS, upsample_steps=UPSAMPLE, min_near_lidar=0.0108, bound=1.0
    )
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)
    res = {}

    def rec(k, v):
        res[k] = v
        print(k, round(v, 2), flush=True)

    rng = np.random.RandomState(0)
    F = 4
    poses = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (F, 4, 4)).copy())
    images = jnp.asarray(rng.rand(F, H, W, 3).astype(np.float32))

    step = make_train_step(module, tcfg, rcfg, patch_size=1)
    key = jax.random.PRNGKey(1)
    vi = jnp.zeros((F, 1), jnp.int32)
    vc = jnp.full((F,), H * W, jnp.int32)

    # params/opt_state are donated by the step: thread them through
    state = {"p": params, "o": opt_state}

    def full(key):
        state["p"], state["o"], m = step(
            state["p"], state["o"], poses, images, vi, vc, 0, key, 0
        )
        return m["loss"]

    rec("full_step_ms", timeit(full, key))
    params = state["p"]

    # render fwd only
    ro = jnp.asarray(rng.randn(NUM_RAYS, 3).astype(np.float32))
    rd = ro / jnp.linalg.norm(ro, axis=-1, keepdims=True)

    @jax.jit
    def fwd(params, ro, rd, key):
        out = render_rays(module, params, ro, rd, key, rcfg, True)
        return out["depth"].sum() + out["image"].sum()

    rec("render_fwd_ms", timeit(fwd, params, ro, rd, key))

    @jax.jit
    def fwdbwd(params, ro, rd, key):
        def loss(p):
            out = render_rays(module, p, ro, rd, key, rcfg, True)
            return out["depth"].sum() + out["image"].sum()
        g = jax.grad(loss)(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    rec("render_fwdbwd_ms", timeit(fwdbwd, params, ro, rd, key))

    # encode kernels at step scale (two passes: 768 + 64 per ray => Q total)
    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    enc_params = params["params"]["hash_table"]
    if enc_params is not None and spec is not None:
        x = jnp.asarray(rng.rand(Q, 3).astype(np.float32))

        @jax.jit
        def efwd(x, table):
            return bh.block_hash_encode(x, table, spec, use_pallas=True).sum()

        rec("encode_fwd_ms", timeit(efwd, x, enc_params))

        @jax.jit
        def efwdbwd(x, table):
            return jnp.sum(jnp.abs(jax.grad(
                lambda t: bh.block_hash_encode(x, t, spec, use_pallas=True).sum()
            )(table)))

        try:
            rec("encode_fwdbwd_ms", timeit(efwdbwd, x, enc_params))
        except Exception as e:
            res["encode_fwdbwd_err"] = str(e)[:120]

    # sort-merge permutation gather at step scale: [N, S, 17]
    vals = jnp.asarray(rng.rand(NUM_RAYS, S, 17).astype(np.float32))
    z = jnp.asarray(rng.rand(NUM_RAYS, S).astype(np.float32))
    order = jnp.argsort(z, axis=1)
    inv = jnp.argsort(order, axis=1)

    @jax.jit
    def pg(vals, order, inv):
        return permutation_gather(vals, order, inv).sum()

    rec("perm_gather_fwd_ms", timeit(pg, vals, order, inv))

    @jax.jit
    def pgb(vals, order, inv):
        return jnp.sum(jax.grad(lambda v: permutation_gather(v, order, inv).sum())(vals))

    rec("perm_gather_fwdbwd_ms", timeit(pgb, vals, order, inv))

    @jax.jit
    def srt(z):
        return jnp.argsort(z, axis=1).sum().astype(jnp.float32)

    rec("argsort_ms", timeit(srt, jnp.concatenate([z, z[:, :64]], axis=1)))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
