"""Boat-fisheye-scale compositing demonstration (VERDICT r2 item 5).

Builds a 6-tile, ~14.5k x 7.6k canvas compositing problem DIRECTLY at the
compose layer (tiles synthesized on device — no host upload, isolating the
compute/memory question), runs the full multiband blend, and records wall
time + peak device memory into GIANT_r05.json.

The reference's largest golden config is the boat fisheye panorama at
(14488, 7556) (/root/reference/tests/test_stitcher.py:83-106); this drives
the same canvas scale through `compose.blend_stack`.

Run on the TPU:  python scripts/giant_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from stitching_tpu.compose import TileStack, blend_stack, fetch_image


def main():
    # 6 tiles in a 3-row x 2-col layout with 15% overlaps -> canvas
    # ~(14.5k, 7.6k) like the boat fisheye config
    th, tw = 5120, 4096
    step_y, step_x = 4680, 3460
    corners, sizes = [], []
    for r in range(3):
        for c in range(2):
            corners.append((c * step_x, r * step_y))
            sizes.append((tw, th))
    b = len(corners)

    key = jax.random.PRNGKey(0)
    data = jax.random.uniform(key, (b, th, tw, 3), jnp.float32) * 255
    masks = jnp.full((b, th, tw), 255.0, jnp.float32)
    stack = TileStack(data, masks, np.asarray(corners, np.int64),
                      np.asarray(sizes, np.int64))

    # warmup (compiles through the persistent cache), then timed:
    # compute-only (device result, one scalar sync) vs the frontier-
    # streamed wall (host panorama, fetch overlapped with compute)
    pano_dev, _ = blend_stack(stack, stack.masks, "multiband", 5)
    np.asarray(pano_dev.ravel()[0])
    t0 = time.time()
    pano_dev, _ = blend_stack(stack, stack.masks, "multiband", 5)
    np.asarray(pano_dev.ravel()[0])
    dt_blend = time.time() - t0
    del pano_dev
    pano = blend_stack(stack, stack.masks, "multiband", 5,
                       stream_fetch=True)[0]   # warm the streamed programs

    def probe_down_mbs():
        probe = jnp.zeros((16_000_000,), jnp.uint8) + 1
        np.asarray(probe[0])
        t0 = time.time()
        np.asarray(probe)
        return round(16.0 / (time.time() - t0), 1)

    # per-run: probe the link right BEFORE the run, so each wall number
    # carries its own transfer floor (fetched bytes / link rate at that
    # moment). wall/floor ~ 1 means the run was transfer-bound and the
    # headline is measuring the tunnel, not the pipeline — the COMPUTE
    # number above is the regression signal (r3->r4 fixed 11.7 s -> 0.6 s
    # of compute; a record without floors would hide such a regression
    # inside the fetch-bound wall).
    mb = 14480 * 7556 * 3 / 1e6
    dts, floors, rates = [], [], []
    for _ in range(2):
        rate = probe_down_mbs()
        t0 = time.time()
        pano = blend_stack(stack, stack.masks, "multiband", 5,
                           stream_fetch=True)[0]
        assert isinstance(pano, np.ndarray)
        dts.append(time.time() - t0)
        rates.append(rate)
        floors.append(mb / max(rate, 0.1))
    dt = min(dts)
    down_mbs = probe_down_mbs()

    try:
        stats = jax.local_devices()[0].memory_stats()
        peak_mb = round(stats.get("peak_bytes_in_use",
                                  stats.get("bytes_in_use", 0)) / 1e6)
    except Exception:
        peak_mb = None

    report = {
        "canvas": list(pano.shape),
        "megapixels": round(pano.shape[0] * pano.shape[1] / 1e6, 1),
        "blend_wall_s": round(dt, 2),
        "blend_wall_runs_s": [round(t, 2) for t in dts],
        "blend_compute_s": round(dt_blend, 2),
        "fetched_mb": round(pano.nbytes / 1e6),
        "fetch_floor_s_runs": [round(f, 2) for f in floors],
        "wall_over_floor_runs": [round(t / max(f, 1e-9), 2)
                                 for t, f in zip(dts, floors)],
        "link_down_mbs_before_runs": rates,
        "link_down_mbs_after_run": down_mbs,
        "peak_device_mem_mb": peak_mb,
        "note": "6x (5120x4096) tiles, multiband nb from blend_width, "
                "device-synthesized inputs (no host upload); wall is the "
                "frontier-streamed blend (fetch overlapped with compute)",
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GIANT_r05.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
