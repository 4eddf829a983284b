"""Pallas TPU kernels for the hot ops.

Kernels live here; every caller in `ops/` gates on `use_pallas()` and keeps
a pure-XLA fallback so the CPU test mesh and non-TPU backends stay correct.
Set STITCHING_TPU_DISABLE_PALLAS=1 to force the XLA paths on TPU (A/B
benchmarking).
"""

import os

import jax


def use_pallas() -> bool:
    if os.environ.get("STITCHING_TPU_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


from .two_nn import two_nn, two_nn_pairs  # noqa: E402,F401
