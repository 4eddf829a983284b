"""Synthetic fixture image sets.

The reference's test images are downloaded from the network at test time
(`/root/reference/tests/__init__.py:1-33`), which is unavailable here, so we
render deterministic synthetic scenes and derive image sets with KNOWN
ground-truth geometry:

- `affine_set`: overlapping translated/rotated crops of a textured scene
  (the budapest/barcode scan-set analog) for the AffineStitcher path.
- `rotation_set`: views from a purely rotating pinhole camera (the boat/s
  set analog) rendered via H = K R^T K_scene^-1, for the spherical pipeline.

Ground truth (camera focal/rotations, pairwise homographies) is returned so
tests can assert reprojection error, not just output shapes.
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def textured_scene(h=800, w=1200, seed=0):
    """Procedural scene with corner-rich, multi-scale structure."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[:] = rng.uniform(40, 80, 3)
    for _ in range(500):
        x, y = rng.randint(0, w - 10), rng.randint(0, h - 10)
        bw, bh = rng.randint(4, 60), rng.randint(4, 60)
        color = rng.uniform(0, 255, 3)
        img[y:y + bh, x:x + bw] = 0.5 * img[y:y + bh, x:x + bw] + 0.5 * color
    # a few gradients for low-frequency structure
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] += 20 * np.sin(xx / 97.0)
    img[..., 1] += 20 * np.cos(yy / 71.0)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if cv2 is not None:
        img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return img


_NATURAL_CACHE = {}


def natural_scene(h=1000, w=1800):
    """A wide NATURAL-photograph scene assembled from offline package
    assets (no network, reference fixtures unavailable): sklearn's two
    sample photos (china temple, flower — rich texture, repetitive
    structure, low-contrast sky) and matplotlib's grace_hopper portrait.
    The reference's entire suite runs on 22 real photographs
    (/root/reference/tests/__init__.py:1-33); this is the offline analog
    that gives detector/matcher/seam stages real-image statistics."""
    key = (h, w)
    if key in _NATURAL_CACHE:
        return _NATURAL_CACHE[key]
    import os

    import matplotlib
    from sklearn.datasets import load_sample_images

    china, flower = load_sample_images().images  # (427, 640, 3) RGB uint8
    hopper_path = os.path.join(os.path.dirname(matplotlib.__file__),
                               "mpl-data", "sample_data",
                               "grace_hopper.jpg")
    hopper = cv2.cvtColor(cv2.imread(hopper_path), cv2.COLOR_BGR2RGB)
    hopper = cv2.resize(hopper, (640, 427))
    row1 = np.concatenate([china, flower, china[:, ::-1]], axis=1)
    row2 = np.concatenate([flower[:, ::-1], hopper, china], axis=1)
    scene = np.concatenate([row1, row2], axis=0)   # (854, 1920, 3)
    scene = cv2.resize(scene, (w, h), interpolation=cv2.INTER_AREA)
    _NATURAL_CACHE[key] = scene
    return scene


def natural_rotation_set(n=4, size=(640, 480), focal=600.0, max_angle=0.5,
                         tilt=0.0, scene_hw=(1000, 1800)):
    """`rotation_set` on the natural-photograph scene: n views from a
    purely rotating camera with KNOWN (K, R) ground truth. Returns
    (imgs, K, R_list). `scene_hw` sizes the scene so wide-FOV view sets
    (e.g. the bench's 1600x1200 at focal 1400, +-0.6 rad) stay inside."""
    assert cv2 is not None, "natural_rotation_set needs cv2 to render"
    w, h = size
    scene = natural_scene(*scene_hw)
    K_scene = np.array([[focal, 0, scene.shape[1] / 2],
                        [0, focal, scene.shape[0] / 2],
                        [0, 0, 1.0]])
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    imgs, Rs = [], []
    angles = np.linspace(-max_angle, max_angle, n)
    for i, ang in enumerate(angles):
        R = rot_y(ang) @ rot_x(tilt * ((i % 2) * 2 - 1))
        Hv = K @ R.T @ np.linalg.inv(K_scene)
        imgs.append(cv2.warpPerspective(scene, Hv, (w, h),
                                        flags=cv2.INTER_LINEAR))
        Rs.append(R)
    return imgs, K, Rs


def affine_set(n=3, seed=0, size=(640, 480)):
    """n overlapping translated crops. Returns (imgs, true_offsets)."""
    w, h = size
    step = int(w * 0.55)
    scene = textured_scene(h + 80, step * (n - 1) + w + 80, seed)
    imgs, offsets = [], []
    for i in range(n):
        x = 40 + i * step
        y = 40 + (i % 2) * 12
        imgs.append(np.ascontiguousarray(scene[y:y + h, x:x + w]))
        offsets.append((x, y))
    return imgs, offsets


def rotation_set(n=3, seed=0, size=(640, 480), focal=600.0, max_angle=0.5,
                 tilt=0.0):
    """n views from a rotating camera. Returns (imgs, K, R_list)."""
    assert cv2 is not None, "rotation_set needs cv2 for the render step"
    w, h = size
    scene = textured_scene(1000, 1800, seed)
    K_scene = np.array([[focal, 0, scene.shape[1] / 2],
                        [0, focal, scene.shape[0] / 2],
                        [0, 0, 1.0]])
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    imgs, Rs = [], []
    angles = np.linspace(-max_angle, max_angle, n)
    for i, ang in enumerate(angles):
        R = rot_y(ang) @ rot_x(tilt * ((i % 2) * 2 - 1))
        Hv = K @ R.T @ np.linalg.inv(K_scene)
        imgs.append(cv2.warpPerspective(scene, Hv, (w, h),
                                        flags=cv2.INTER_LINEAR))
        Rs.append(R)
    return imgs, K, Rs


def reprojection_error(H_est, H_true, size=(640, 480), n_grid=8):
    """Mean action difference of two homographies over an image grid (px)."""
    w, h = size
    xs = np.linspace(w * 0.1, w * 0.9, n_grid)
    ys = np.linspace(h * 0.1, h * 0.9, n_grid)
    pts = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)

    def apply(H, p):
        ph = np.concatenate([p, np.ones((len(p), 1))], 1) @ np.asarray(H).T
        return ph[:, :2] / ph[:, 2:]

    return float(np.abs(apply(H_est, pts) - apply(H_true, pts)).mean())
