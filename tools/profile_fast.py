"""Phase-profile the --fast (occupancy-prior) training step on the chip.

The fast step runs at ~17.6k rays/s (233 ms / 4096-ray step, S=192+64) vs
parity's 8.7k (433 ms, S=768+64). Encode work scales with S (~120 ms at
fast scale), so the fast step carries ~110 ms of non-encode cost where the
parity step carries ~40 — this tool breaks that down to direct the next
optimization:

  - full fast step (jitted, donated, as the trainer runs it)
  - the same step WITHOUT an occ grid (uniform sampling at S=256)
  - update_occ_grid alone (128^3 field refresh; amortized /16 steps)
  - occ_bin_pdf + CDF draw alone at step scale
  - render fwd / fwd+bwd with occ, encode fwd / fwd+bwd at fast scale

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_fast.py

Round-5 restructure: the piece-wise phases run FIRST (they compile in
seconds) and the two full-step arms run LAST behind --full, so the round-4
full-step compile stall can no longer block the attribution data.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also time the two full train-step arms (slow compile)")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from lidarnerf_tpu.models.network import NeRFNetwork
    from lidarnerf_tpu.models.occupancy import (
        OccConfig, init_occ_grid, update_occ_grid, occ_bin_pdf, occ_z_vals,
    )
    from lidarnerf_tpu.models.renderer import RenderConfig, render_rays
    from lidarnerf_tpu.nerf.train_step import (
        TrainConfig, make_optimizer, make_train_step,
    )
    from lidarnerf_tpu.ops import block_hash as bh
    from lidarnerf_tpu.ops.sampling import sample_pdf
    from lidarnerf_tpu.ops.compositing import merged_composite_weights

    H, W = 66, 1030
    NUM_RAYS, NUM_STEPS, UPSAMPLE = 4096, 192, 64
    S = NUM_STEPS + UPSAMPLE
    Q = NUM_RAYS * S
    SCALE = 0.009914

    module = NeRFNetwork(
        encoding="blockhash", desired_resolution=32768, log2_hashmap_size=19,
        bound=1.0, compute_dtype=jnp.bfloat16,
    )
    tcfg = TrainConfig(
        alpha_d=1000.0, alpha_i=10.0, alpha_grad=100.0, grad_loss=True,
        scale=SCALE, num_rays_lidar=NUM_RAYS, H_lidar=H, W_lidar=W,
        intrinsics_lidar=(2.0, 26.9), iters=30000,
    )
    occ_cfg = OccConfig(dilate=1)
    rcfg = RenderConfig(
        num_steps=NUM_STEPS, upsample_steps=UPSAMPLE, min_near_lidar=SCALE,
        bound=1.0, occ=occ_cfg,
    )
    rcfg_nocc = RenderConfig(
        num_steps=NUM_STEPS, upsample_steps=UPSAMPLE, min_near_lidar=SCALE,
        bound=1.0,
    )

    params = module.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    opt = make_optimizer(tcfg)

    res = {}

    def rec(k, v):
        res[k] = round(v, 2)
        print(k, round(v, 2), flush=True)

    rng = np.random.RandomState(0)
    F = 4
    poses = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (F, 4, 4)).copy())
    images = jnp.asarray(rng.rand(F, H, W, 3).astype(np.float32))
    vi = jnp.zeros((F, 1), jnp.int32)
    vc = jnp.full((F,), H * W, jnp.int32)
    key = jax.random.PRNGKey(1)
    grid = init_occ_grid(occ_cfg) + 1.0  # non-trivial occupancy

    it = args.iters

    # --- piece-wise phases first (compile in seconds each) ---

    # occ CDF machinery alone at step scale
    ro = jnp.asarray(rng.randn(NUM_RAYS, 3).astype(np.float32)) * 0.01
    rd = jnp.asarray(rng.randn(NUM_RAYS, 3).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    nears = jnp.full((NUM_RAYS, 1), SCALE)
    fars = jnp.full((NUM_RAYS, 1), SCALE * 81.0)

    @jax.jit
    def occ_pdf_only(grid):
        return occ_bin_pdf(grid, ro, rd, nears, fars, occ_cfg, 1.0).sum()

    rec("occ_pdf_only_ms", timeit(occ_pdf_only, grid, iters=it))

    @jax.jit
    def occ_draw(grid, key):
        pdf = occ_bin_pdf(grid, ro, rd, nears, fars, occ_cfg, 1.0)
        z = occ_z_vals(key, nears, fars, pdf, NUM_STEPS, True)
        return z.sum()

    rec("occ_pdf_plus_cdf_ms", timeit(occ_draw, grid, key, iters=it))

    # importance upsample (sample_pdf) alone at fast scale
    z_sorted = jnp.sort(
        jnp.asarray(rng.rand(NUM_RAYS, NUM_STEPS).astype(np.float32)), axis=-1
    ) * (SCALE * 80.0) + SCALE
    w_coarse = jnp.asarray(rng.rand(NUM_RAYS, NUM_STEPS).astype(np.float32))

    @jax.jit
    def up(key):
        deltas = z_sorted[..., 1:] - z_sorted[..., :-1]
        z_mid = z_sorted[..., :-1] + 0.5 * deltas
        return sample_pdf(key, z_mid, w_coarse[:, 1:-1], UPSAMPLE, det=False).sum()

    rec("sample_pdf_ms", timeit(up, key, iters=it))

    # merged compositing (cross-terms) alone, fwd and fwd+bwd
    zB = jnp.sort(
        jnp.asarray(rng.rand(NUM_RAYS, UPSAMPLE).astype(np.float32)), axis=-1
    ) * (SCALE * 80.0) + SCALE
    sigA = jnp.asarray(rng.rand(NUM_RAYS, NUM_STEPS).astype(np.float32)) * 20.0
    sigB = jnp.asarray(rng.rand(NUM_RAYS, UPSAMPLE).astype(np.float32)) * 20.0
    sd = (fars - nears) / NUM_STEPS

    @jax.jit
    def mc_fwd(sigA, sigB):
        wA, wB = merged_composite_weights(z_sorted, sigA, zB, sigB, sd)
        return wA.sum() + wB.sum()

    rec("merged_composite_fwd_ms", timeit(mc_fwd, sigA, sigB, iters=it))

    @jax.jit
    def mc_fwdbwd(sigA, sigB):
        ga, gb = jax.grad(
            lambda a, b: mc_fwd(a, b), argnums=(0, 1)
        )(sigA, sigB)
        return jnp.abs(ga).sum() + jnp.abs(gb).sum()

    rec("merged_composite_fwdbwd_ms", timeit(mc_fwdbwd, sigA, sigB, iters=it))

    # render phases with occ
    @jax.jit
    def fwd(params, g, key):
        out = render_rays(module, params, ro, rd, key, rcfg, True, g)
        return out["depth"].sum() + out["image"].sum()

    rec("render_fwd_fast_ms", timeit(fwd, params, grid, key, iters=it))

    @jax.jit
    def fwdbwd(params, g, key):
        def loss(p):
            out = render_rays(module, p, ro, rd, key, rcfg, True, g)
            return out["depth"].sum() + out["image"].sum()
        gr = jax.grad(loss)(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gr))

    rec("render_fwdbwd_fast_ms", timeit(fwdbwd, params, grid, key, iters=it))

    # uniform-sampling render control at the same S (isolates the occ-CDF
    # draw + any occ-induced fusion change inside the real render graph)
    @jax.jit
    def fwdbwd_nocc(params, key):
        def loss(p):
            out = render_rays(module, p, ro, rd, key, rcfg_nocc, True, None)
            return out["depth"].sum() + out["image"].sum()
        gr = jax.grad(loss)(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gr))

    rec("render_fwdbwd_uniform_s256_ms", timeit(fwdbwd_nocc, params, key, iters=it))

    # encode at fast scale
    spec = bh.make_block_hash_spec(
        num_levels=16, base_resolution=16, log2_hashmap_size=19,
        desired_resolution=32768,
    )
    table = params["params"]["hash_table"]
    x = jnp.asarray(rng.rand(Q, 3).astype(np.float32))

    @jax.jit
    def efwd(x, t):
        return bh.block_hash_encode(x, t, spec, use_pallas=True).sum()

    rec("encode_fwd_fastscale_ms", timeit(efwd, x, table, iters=it))

    @jax.jit
    def efwdbwd(x, t):
        return jnp.sum(jnp.abs(jax.grad(
            lambda tt: bh.block_hash_encode(x, tt, spec, use_pallas=True).sum()
        )(t)))

    rec("encode_fwdbwd_fastscale_ms", timeit(efwdbwd, x, table, iters=it))

    # occ grid refresh (amortized over update_interval=16 steps)
    t = timeit(
        lambda: update_occ_grid(module, params, grid, key, occ_cfg, 1.0).sum(),
        iters=it,
    )
    rec("update_occ_grid_ms", t)
    rec("update_occ_grid_amortized_ms", t / occ_cfg.update_interval)

    # --- full train-step arms last (slow compile; round-4 stall point) ---
    if args.full:
        for tag, cfg_r, g in (("fast", rcfg, grid), ("uniform_s256", rcfg_nocc, None)):
            print(f"compiling full_step_{tag} ...", flush=True)
            # fresh param copies per arm: the step donates its inputs, so
            # sharing `params` across arms would hand arm 2 deleted buffers
            p0 = jax.tree.map(jnp.copy, params)
            step = make_train_step(module, tcfg, cfg_r, patch_size=1)
            state = {"p": p0, "o": opt.init(p0)}

            def full(key, g=g, step=step, state=state):
                state["p"], state["o"], m = step(
                    state["p"], state["o"], poses, images, vi, vc, 0, key, 0,
                    occ_grid=g,
                )
                return m["loss"]

            rec(f"full_step_{tag}_ms", timeit(full, key, iters=it))

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
