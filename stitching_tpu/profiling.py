"""Tracing / profiling subsystem.

The reference has no built-in profiling (SURVEY.md §5: the only profiling is
test-local tracemalloc + wall clock); for the TPU build, per-stage timing and
XLA device traces are first-class:

- `stage_timer(name)`: context manager recording wall time per pipeline
  stage into a process-global report (enabled via STITCHING_TPU_PROFILE=1
  or `enable()`).
- `fence(*arrays)`: sync point at a stage boundary — a no-op in normal
  runs (stages stay async; device work and transfers overlap freely), but
  with STITCHING_TPU_PROFILE_FENCE=1 (or `enable_fence()`) it blocks until
  the given device arrays are materialized, so each stage's recorded time
  covers exactly its own compute. Without fencing, async dispatch makes a
  stage's compute sync inside whichever LATER stage first touches results
  (the round-3 stage table misattributed ~2 s of FINAL-pass compute to
  `final/download` this way). Fenced runs are for attribution; the
  headline wall time must come from unfenced runs.
- `device_trace(logdir)`: context manager wrapping `jax.profiler.trace` —
  produces a TensorBoard-loadable XLA trace of everything dispatched inside.
- `get_report()` / `print_report()`: stage table with call counts and totals.
"""

import contextlib
import os
import time
from collections import defaultdict

_ENABLED = os.environ.get("STITCHING_TPU_PROFILE", "") not in ("", "0")
_FENCE = os.environ.get(
    "STITCHING_TPU_PROFILE_FENCE", "") not in ("", "0")
_STAGES = defaultdict(lambda: [0, 0.0])  # name -> [count, total_s]


def enable(on=True):
    global _ENABLED
    _ENABLED = on


def enable_fence(on=True):
    global _FENCE
    _FENCE = on


def fence(*arrays):
    """Block until `arrays` (pytrees of device arrays) are materialized —
    only when fence mode is on. Syncs via a scalar fetch because
    `block_until_ready` is unreliable on tunneled backends."""
    if not (_ENABLED and _FENCE):
        return
    import jax
    import numpy as np

    from .transfer import _first_elem

    for a in arrays:
        for leaf in jax.tree_util.tree_leaves(a):
            if isinstance(leaf, jax.Array):
                np.asarray(_first_elem(leaf))


def record(name, seconds):
    """Record an externally measured duration as a stage entry (used by
    background workers, e.g. the transfer uploader thread)."""
    if not _ENABLED:
        return
    rec = _STAGES[name]
    rec[0] += 1
    rec[1] += seconds


def reset():
    _STAGES.clear()


@contextlib.contextmanager
def stage_timer(name):
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = _STAGES[name]
        rec[0] += 1
        rec[1] += time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(logdir):
    import jax

    with jax.profiler.trace(logdir):
        yield


def get_report():
    return {k: dict(calls=v[0], total_s=round(v[1], 4))
            for k, v in _STAGES.items()}


def print_report():
    rep = get_report()
    if not rep:
        return
    width = max(len(k) for k in rep)
    for k, v in sorted(rep.items(), key=lambda kv: -kv[1]["total_s"]):
        print(f"{k:<{width}}  calls={v['calls']:<4d} "
              f"total={v['total_s']:.3f}s")
