"""Part 2 of the Mosaic compile-time repro (tools/compile_repro.py): sweep the
QUERY-BATCH size at fixed specs. Round 4 reported a 234 s backward compile "at
B=2048" — if B was the query batch, Qp pads to one single CHUNK and the kernel
grid degenerates to nchunks=1, a boundary case worth isolating.

PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    /opt/venv/bin/python -u tools/compile_repro_q.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def time_compile(fn, *args):
    t0 = time.perf_counter()
    c = fn.lower(*args).compile()
    return round(time.perf_counter() - t0, 2)


def main():
    jax.config.update("jax_enable_compilation_cache", False)
    from lidarnerf_tpu.ops import block_hash as bh
    from lidarnerf_tpu.ops import block_hash_pallas as bhp

    rng = np.random.RandomState(0)
    for log2, desired in ((19, 32768), (17, 4096)):
        spec = bh.make_block_hash_spec(
            num_levels=16, base_resolution=16,
            log2_hashmap_size=log2, desired_resolution=desired,
        )
        table = jnp.zeros((spec.table_rows, 128), jnp.float32)
        for Q in (2048, 4096, 8192, 32768, 294912):
            x = jnp.asarray(rng.rand(Q, 3).astype(np.float32))
            g = jnp.zeros((Q, spec.output_dim), jnp.float32)
            rows, lf, _ = jax.jit(
                bhp.prep_inputs_padded, static_argnames=("spec",)
            )(x, spec=spec)
            jax.block_until_ready((rows, lf))
            rec = {"log2": log2, "Q": Q, "nchunks": lf.shape[-1] // bhp.CHUNK}
            print("start", rec, flush=True)
            rec["fwd_s"] = time_compile(
                jax.jit(bhp._fwd_from_prep, static_argnames=("Q", "spec")),
                rows, lf, table, Q, spec,
            )
            rec["bwd_s"] = time_compile(
                jax.jit(bhp._bwd_from_prep, static_argnames=("spec",)),
                rows, lf, g, spec,
            )
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
