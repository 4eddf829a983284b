"""Test configuration: CPU backend with virtual multi-device mesh.

Mirrors the reference's CI strategy (single CPU runner) while enabling
multi-chip sharding tests via XLA's host-platform device-count flag
(SURVEY.md §4 'implication for the TPU build's test strategy').
"""

import os
import sys

# Must run before jax import. The main suite runs single-device (virtual
# multi-device changes every XLA cache key and quadruples compile time on
# this 2-vCPU runner); sharding tests spawn subprocesses with
# --xla_force_host_platform_device_count=8 (see tests/test_parallel.py).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The env var alone is not honored when the axon TPU plugin is installed —
# it still initializes the (slow, tunneled) TPU backend. The config update
# below is authoritative; keep both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, os.path.dirname(__file__))
