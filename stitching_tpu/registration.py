"""Registration-state checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5: a rerun recomputes
everything). Here the expensive registration result (cameras + the warper
scale + the subset indices) can be persisted, so composition can be re-run —
e.g. at a different final resolution, with a different seam finder or
blender — without re-detecting/re-matching/re-adjusting.

Format: a single .npz with the camera parameter stack and metadata.
"""

import numpy as np

from .types import CameraParams


def save_registration(path, cameras, indices=None, scale=None, extra=None):
    data = dict(
        focal=np.array([c.focal for c in cameras]),
        aspect=np.array([c.aspect for c in cameras]),
        ppx=np.array([c.ppx for c in cameras]),
        ppy=np.array([c.ppy for c in cameras]),
        R=np.stack([c.R for c in cameras]),
    )
    if indices is not None:
        data["indices"] = np.asarray(indices)
    if scale is not None:
        data["scale"] = np.asarray(scale)
    if extra:
        for k, v in extra.items():
            data["extra_" + k] = np.asarray(v)
    np.savez(path, **data)


def load_registration(path):
    z = np.load(path)
    cameras = [
        CameraParams(
            focal=float(z["focal"][i]), aspect=float(z["aspect"][i]),
            ppx=float(z["ppx"][i]), ppy=float(z["ppy"][i]),
            R=z["R"][i].astype(np.float32))
        for i in range(len(z["focal"]))
    ]
    out = dict(cameras=cameras)
    if "indices" in z:
        out["indices"] = z["indices"]
    if "scale" in z:
        out["scale"] = float(z["scale"])
    return out
