"""A/B the production warp_stack fast (block-window) path vs the quad
path on the bench scene's real warp geometry: timing + content delta on
mask-255 pixels + mask equality.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402
from fixtures import rotation_set  # noqa: E402

from stitching_tpu import compose  # noqa: E402
from stitching_tpu.pipeline import stack_images  # noqa: E402


def sync(ts):
    np.asarray(ts.data.ravel()[0])


def main():
    imgs, K, Rs = rotation_set(n=8, size=(1600, 1200), focal=1400.0,
                               max_angle=0.6)
    stack = stack_images(imgs)
    f = 1400.0
    Ks = [K] * 8

    def run(force_quad):
        if force_quad:
            os.environ["STITCHING_TPU_DISABLE_PALLAS"] = "1"
        else:
            os.environ.pop("STITCHING_TPU_DISABLE_PALLAS", None)
        ts = compose.warp_stack(stack.data, stack.sizes, Ks, Rs, f,
                                "spherical")
        sync(ts)
        t0 = time.time()
        for _ in range(3):
            ts = compose.warp_stack(stack.data, stack.sizes, Ks, Rs, f,
                                    "spherical")
            sync(ts)
        return (time.time() - t0) / 3, ts

    t_fast, ts_fast = run(False)
    t_quad, ts_quad = run(True)
    print(f"warp_stack fast: {t_fast*1e3:.1f} ms   "
          f"quad: {t_quad*1e3:.1f} ms   speedup {t_quad/t_fast:.1f}x")

    mf = np.asarray(ts_fast.masks)
    mq = np.asarray(ts_quad.masks)
    print("mask equal:", bool((mf == mq).all()))
    df = np.asarray(ts_fast.data)
    dq = np.asarray(ts_quad.data)
    on = mq > 0
    diff = np.abs(df - dq)[on]
    print(f"content delta on mask-255 px: max {diff.max():.3f} "
          f"mean {diff.mean():.5f}")


if __name__ == "__main__":
    main()
