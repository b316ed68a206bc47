"""Minimal repro harness for the Mosaic compile-time pathology (VERDICT r4 #3).

Round-4 observation: the Pallas block-hash BACKWARD kernel takes ~234 s to
compile at the `--small` spec (log2_hashmap_size=17 -> blocks_per_level
B=2048, desired_resolution=4096) vs tens of seconds at the flagship spec
(log2=19 -> B=8192, desired=32768), and the standalone fast-step compile
stalled >25 min. This tool isolates WHICH parameter triggers it by timing
`.lower()` + `.compile()` of the fwd and bwd kernels across a small matrix:

  - blocks_per_level via log2_hashmap_size in {17, 19}
  - level-scale ladder via desired_resolution in {4096, 32768}
  - (Q fixed at 8 chunks; grid size does not change the traced kernel body)

Each cell runs in-process (fresh jit closures, no persistent cache dir), and
prints one JSON line per cell so a hang is attributable to the last-started
cell. Run on the chip:

  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      /opt/venv/bin/python -u tools/compile_repro.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def time_compile(fn, *args):
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    return round(t_lower, 2), round(t_compile, 2)


def main():
    jax.config.update("jax_enable_compilation_cache", False)
    from lidarnerf_tpu.ops import block_hash as bh
    from lidarnerf_tpu.ops import block_hash_pallas as bhp

    Q = bhp.CHUNK * 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(Q, 3).astype(np.float32))

    for log2 in (17, 19):
        for desired in (4096, 32768):
            spec = bh.make_block_hash_spec(
                num_levels=16, base_resolution=16,
                log2_hashmap_size=log2, desired_resolution=desired,
            )
            B = spec.blocks_per_level
            table = jnp.zeros((spec.table_rows, 128), jnp.float32)
            g = jnp.zeros((Q, spec.output_dim), jnp.float32)
            rows, lf, _ = jax.jit(
                bhp.prep_inputs_padded, static_argnames=("spec",)
            )(x, spec=spec)
            jax.block_until_ready((rows, lf))

            rec = {"log2": log2, "desired": desired, "B": B,
                   "mxu_cols": bhp._mxu_cols(spec)}
            print("start fwd", rec, flush=True)
            lo, co = time_compile(
                jax.jit(bhp._fwd_from_prep, static_argnames=("Q", "spec")),
                rows, lf, table, Q, spec,
            )
            rec["fwd_lower_s"], rec["fwd_compile_s"] = lo, co
            print("start bwd", rec, flush=True)
            lo, co = time_compile(
                jax.jit(bhp._bwd_from_prep, static_argnames=("spec",)),
                rows, lf, g, spec,
            )
            rec["bwd_lower_s"], rec["bwd_compile_s"] = lo, co
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
