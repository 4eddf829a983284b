"""A/B probe: ORB per-level `approx_max_k` vs exact `top_k` selection.

Measures keypoint-set recall of the production two-stage reduction against
the exact selection on the bench scene's MEDIUM-resolution images (the
shapes the pipeline actually detects on). Run on the TPU backend; records
the number the `tests/test_detector.py::test_approx_topk_recall` contract
cites (approx_max_k is exact on CPU, so only a TPU run measures anything).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402
from fixtures import rotation_set  # noqa: E402

from stitching_tpu.images import Images  # noqa: E402
from stitching_tpu.ops.orb import detect_orb  # noqa: E402
from stitching_tpu.ops.resize import resize  # noqa: E402


def main():
    imgs, K, Rs = rotation_set(n=8, size=(1600, 1200), focal=1400.0,
                               max_angle=0.6)
    images_obj = Images.of(list(imgs), 0.6, 0.1, -1)
    med_sizes = images_obj.get_scaled_img_sizes(Images.Resolution.MEDIUM)

    recalls = []
    for im, size in zip(imgs, med_sizes):
        im16 = im.astype(np.uint16)
        gray = ((29 * im16[..., 0] + 150 * im16[..., 1]
                 + 77 * im16[..., 2] + 128) >> 8).astype(np.uint8)
        gray = resize(gray, size).astype(np.float32)
        g = jnp.asarray(gray)
        a = jax.device_get(detect_orb(g, nfeatures=500))
        e = jax.device_get(detect_orb(g, nfeatures=500, exact_topk=True))
        sa = {(int(x), int(y), int(s))
              for (x, y), s, v in zip(a["xy"], a["size"], a["valid"]) if v}
        se = {(int(x), int(y), int(s))
              for (x, y), s, v in zip(e["xy"], e["size"], e["valid"]) if v}
        recalls.append(len(sa & se) / max(len(se), 1))

    print(json.dumps({
        "backend": jax.default_backend(),
        "per_image_recall": [round(r, 4) for r in recalls],
        "mean_recall": round(float(np.mean(recalls)), 4),
        "min_recall": round(float(np.min(recalls)), 4),
    }))


if __name__ == "__main__":
    main()
