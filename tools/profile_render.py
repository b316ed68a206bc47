"""Break the non-encode render cost into MLP/color/compositing phases.

After the round-5 gather-free CDF rewrite, the uniform-S256 render fwd+bwd
measures ~130 ms of which encode is ~79 and sample_pdf/compositing ~6 — this
tool attributes the remaining ~45 ms: sigma-MLP, the color head (whose input
is a [N, S, 75] broadcast of the per-ray direction encoding concatenated with
per-sample geo features — a materialization suspect), and the coarse
composite_weights. It also times a split-matmul color variant that applies
the first layer to d_enc per-RAY and broadcasts the [N, 64] preactivation
instead of the [N, S, 75] input.

PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python -u tools/profile_render.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from lidarnerf_tpu.models.network import NeRFNetwork
    from lidarnerf_tpu.ops.compositing import composite_weights

    N, T, U = 4096, 192, 64
    S = T + U
    G = 15

    module = NeRFNetwork(
        encoding="blockhash", desired_resolution=32768, log2_hashmap_size=19,
        bound=1.0, compute_dtype=jnp.bfloat16,
    )
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(N, S, 3).astype(np.float32)) * 2.0 - 1.0
    rays_d = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    geo = jnp.asarray(rng.randn(N, S, G).astype(np.float32)) * 0.3
    weights = jnp.asarray(rng.rand(N, S).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.rand(N, T).astype(np.float32)), axis=-1)
    sig = jnp.asarray(rng.rand(N, T).astype(np.float32)) * 20.0
    sd = jnp.full((N, 1), 1.0 / T)

    res = {}

    def rec(k, v):
        res[k] = round(v, 2)
        print(k, round(v, 2), flush=True)

    # density pass (encode + sigma MLP) fwd / fwd+bwd
    @jax.jit
    def dens(params, xyz):
        sigma, geo_f = module.apply(params, xyz, method=module.density)
        return sigma.sum() + geo_f.sum()

    rec("density_fwd_ms", timeit(dens, params, xyz))

    @jax.jit
    def dens_bwd(params, xyz):
        g = jax.grad(lambda p: dens(p, xyz))(params)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    rec("density_fwdbwd_ms", timeit(dens_bwd, params, xyz))

    # color head as the renderer calls it: broadcast d_enc + concat + MLP
    @jax.jit
    def col(params, rays_d, geo, weights):
        d_enc = module.apply(params, rays_d, True, method=module.encode_dir)
        d_enc_b = jnp.broadcast_to(d_enc[:, None, :], geo.shape[:-1] + (d_enc.shape[-1],))
        rgbs = module.apply(params, d_enc_b, geo, True, method=module.color_from_enc)
        return jnp.where((weights > 1e-4)[..., None], rgbs, 0.0).sum()

    rec("color_fwd_ms", timeit(col, params, rays_d, geo, weights))

    @jax.jit
    def col_bwd(params, rays_d, geo, weights):
        g = jax.grad(lambda p, gg: col(p, rays_d, gg, weights), argnums=(0, 1))(
            params, geo
        )
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    rec("color_fwdbwd_ms", timeit(col_bwd, params, rays_d, geo, weights))

    # split-matmul color variant: first layer applied to d_enc per ray
    ln = params["params"]["lidar_color_net"]
    W0 = ln["Dense_0"]["kernel"]  # [75 + G, 64]
    W1 = ln["Dense_1"]["kernel"]
    W2 = ln["Dense_2"]["kernel"]

    @jax.jit
    def col_split(params, rays_d, geo, weights):
        d_enc = module.apply(params, rays_d, True, method=module.encode_dir)
        E = d_enc.shape[-1]
        pre_d = (d_enc.astype(jnp.bfloat16) @ W0[:E].astype(jnp.bfloat16))  # [N, 64]
        h = pre_d[:, None, :] + geo.astype(jnp.bfloat16) @ W0[E:].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        h = jax.nn.relu(h @ W1.astype(jnp.bfloat16))
        rgbs = jax.nn.sigmoid((h @ W2.astype(jnp.bfloat16)).astype(jnp.float32))
        return jnp.where((weights > 1e-4)[..., None], rgbs, 0.0).sum()

    rec("color_split_fwd_ms", timeit(col_split, params, rays_d, geo, weights))

    @jax.jit
    def col_split_bwd(params, rays_d, geo, weights):
        g = jax.grad(
            lambda p, gg: col_split(p, rays_d, gg, weights), argnums=(0, 1)
        )(params, geo)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    rec("color_split_fwdbwd_ms", timeit(col_split_bwd, params, rays_d, geo, weights))

    # coarse composite_weights (the stop-grad pass feeding sample_pdf)
    @jax.jit
    def cw(sig):
        return composite_weights(sig, z, sd).sum()

    rec("composite_weights_fwd_ms", timeit(cw, sig))

    print(json.dumps(res), flush=True)


def mlp_only():
    """Isolate the sigma-MLP fwd/fwdbwd on a precomputed feature batch."""
    from lidarnerf_tpu.models.network import NeRFNetwork
    from lidarnerf_tpu.ops.activation import trunc_exp

    module = NeRFNetwork(
        encoding="blockhash", desired_resolution=32768, log2_hashmap_size=19,
        bound=1.0, compute_dtype=jnp.bfloat16,
    )
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    rng = np.random.RandomState(0)
    Q = 4096 * 256
    feat = jnp.asarray(rng.randn(Q, 32).astype(np.float32)) * 0.1
    sn = params["params"]["sigma_net"]

    def net(sn, feat):
        h = feat.astype(jnp.bfloat16)
        h = h @ sn["Dense_0"]["kernel"].astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        h = h @ sn["Dense_1"]["kernel"].astype(jnp.bfloat16)
        h = h.astype(jnp.float32)
        sigma = trunc_exp(h[..., 0])
        return sigma.sum() + h[..., 1:].sum()

    f = jax.jit(net)
    print("sigma_mlp_fwd_ms", round(timeit(f, sn, feat), 2), flush=True)

    g = jax.jit(lambda sn, feat: sum(
        jnp.sum(jnp.abs(x))
        for x in jax.tree.leaves(jax.grad(net, argnums=(0, 1))(sn, feat))
    ))
    print("sigma_mlp_fwdbwd_ms", round(timeit(g, sn, feat), 2), flush=True)


if __name__ == "__main__":
    import sys

    if "--mlp" in sys.argv:
        mlp_only()
    else:
        main()
