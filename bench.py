"""End-to-end stitching benchmark.

Stitches a synthetic rotating-camera panorama set (the boat-set analog; the
reference's fixture images need network access, unavailable here) with the
full default pipeline and reports end-to-end throughput in megapixels of
composited panorama per second (BASELINE.json primary metric).

`vs_baseline`: ratio of our throughput to OpenCV's own native stitching
pipeline (cv2.Stitcher PANORAMA mode — the same cv::detail pipeline the
reference package drives) on the same inputs on this host. >1 means faster
than the reference's native engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from fixtures import rotation_set
    from stitching_tpu import Stitcher

    imgs, K, Rs = rotation_set(n=5, size=(1024, 768), focal=900.0,
                               max_angle=0.55)

    def run_once():
        stitcher = Stitcher(crop=False)
        t0 = time.time()
        pano = stitcher.stitch(imgs)
        return pano, time.time() - t0

    # warmup (compilation) + timed run
    pano, _ = run_once()
    pano, dt = run_once()
    mp = pano.shape[0] * pano.shape[1] / 1e6
    ours_mps = mp / dt

    # OpenCV native baseline (the reference package's engine) on same input
    vs_baseline = float("nan")
    try:
        import cv2

        st = cv2.Stitcher_create(cv2.Stitcher_PANORAMA)
        t0 = time.time()
        status, ref_pano = st.stitch(imgs)
        ref_dt = time.time() - t0
        if status == cv2.Stitcher_OK:
            ref_mp = ref_pano.shape[0] * ref_pano.shape[1] / 1e6
            vs_baseline = ours_mps / (ref_mp / ref_dt)
    except Exception:
        pass

    print(json.dumps({
        "metric": "end_to_end_stitch_throughput",
        "value": round(ours_mps, 3),
        "unit": "megapixels/s",
        "vs_baseline": (None if np.isnan(vs_baseline)
                        else round(vs_baseline, 3)),
    }))


if __name__ == "__main__":
    main()
