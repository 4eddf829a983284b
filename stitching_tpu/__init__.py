"""stitching_tpu — a TPU-native image-stitching framework (JAX/XLA/Pallas).

Public API surface mirrors the reference package
(`/root/reference/stitching/__init__.py:1-3`): `Stitcher`, `AffineStitcher`.
"""

__version__ = "0.1.0"

from .errors import StitchingError, StitchingWarning  # noqa: F401

try:
    from .stitcher import AffineStitcher, Stitcher  # noqa: F401
except ImportError:  # during early bootstrap, stitcher may not exist yet
    pass
