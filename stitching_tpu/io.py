"""Host-side image file I/O.

The compute pipeline is pure JAX/XLA; file decode/encode stays on the host.
Images are numpy uint8 arrays in **BGR** channel order (matching the
reference's cv.imread convention, `stitching/images.py:113-116`), so user code
written against the reference keeps working unmodified.

We prefer OpenCV for decode if importable (it is the de-facto host codec and
keeps byte-level parity with the reference); otherwise we fall back to Pillow.
Neither is used for any algorithmic work.
"""

import numpy as np

from .errors import StitchingError

try:  # pragma: no cover - environment dependent
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None

if _cv2 is None:  # pragma: no cover
    try:
        from PIL import Image as _PILImage
    except Exception:
        _PILImage = None
else:
    _PILImage = None


def read_image(path: str) -> np.ndarray:
    """Read an image file into a BGR uint8 array (HxWx3) or grayscale (HxW)."""
    if _cv2 is not None:
        img = _cv2.imread(path)
        if img is None:
            raise StitchingError("Cannot read image " + path)
        return img
    if _PILImage is not None:
        try:
            pil = _PILImage.open(path).convert("RGB")
        except Exception as exc:
            raise StitchingError("Cannot read image " + path) from exc
        return np.asarray(pil)[:, :, ::-1].copy()
    raise StitchingError(
        "No image codec available (need cv2 or PIL) to read " + path
    )


def write_image(path: str, img: np.ndarray, params=None) -> bool:
    """Write a BGR uint8 array to an image file."""
    img = np.ascontiguousarray(img)
    if _cv2 is not None:
        if params:
            return bool(_cv2.imwrite(path, img, params))
        return bool(_cv2.imwrite(path, img))
    if _PILImage is not None:
        arr = img[:, :, ::-1] if img.ndim == 3 else img
        _PILImage.fromarray(arr).save(path)
        return True
    raise StitchingError("No image codec available (need cv2 or PIL)")
