"""Kernel dispatch: TPU Pallas kernels vs portable XLA fallbacks.

Every hot op in this package has two implementations — a Mosaic (Pallas)
kernel for TPU and a pure-XLA fallback that runs anywhere. The choice is made
at trace time, so it must predict the platform the trace will be *compiled*
for, not merely the process's highest-priority backend:

- `jax.default_device(cpu)` contexts (used by the driver's multi-chip dryrun
  and by debugging sessions on TPU hosts) compile for CPU even when a TPU
  backend exists — `jax.config.jax_default_device` is consulted first.
- `LIDARNERF_TPU_KERNELS=0/1` force-overrides either way (escape hatch the
  round-1 advisor asked for).
- Otherwise the process default backend decides ("axon" is the tunneled
  single-chip TPU platform).
"""

import os

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def kernel_platform() -> str:
    """Best-effort platform the current trace will be compiled for."""
    override = os.environ.get("LIDARNERF_TPU_KERNELS")
    if override is not None:
        return "tpu" if override.lower() not in ("0", "false", "off") else "cpu"
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            # jax.default_device also accepts a platform *string* ("tpu");
            # getattr on a str would silently return "cpu" and disable the
            # Pallas kernels on TPU
            return dd if isinstance(dd, str) else getattr(dd, "platform", "cpu")
    except Exception:
        pass
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def on_tpu() -> bool:
    return kernel_platform() in _TPU_PLATFORMS
