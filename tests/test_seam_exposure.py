"""Seam finders and exposure compensation on synthetic overlaps."""

import numpy as np

from stitching_tpu.exposure_error_compensator import ExposureErrorCompensator
from stitching_tpu.seam_finder import SeamFinder


def _overlap_pair():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (128, 384, 3), np.uint8)
    img1 = base[:, :256].copy()
    img2 = base[:, 128:].copy()
    corners = [(0, 0), (128, 0)]
    masks = [np.full((128, 256), 255, np.uint8),
             np.full((128, 256), 255, np.uint8)]
    return [img1, img2], corners, masks


def test_voronoi_partition():
    imgs, corners, masks = _overlap_pair()
    finder = SeamFinder("voronoi")
    seams = finder.find(imgs, corners, masks)
    # each pixel of the overlap should belong to exactly one image;
    # exclusive regions keep their owner
    assert (seams[0][:, :128] > 0).all()
    assert (seams[1][:, 128:] > 0).all()
    s0 = seams[0][:, 128:] > 0
    s1 = seams[1][:, :128] > 0
    union = s0 | s1
    assert union.all()
    # voronoi splits the overlap near its middle
    mid = 64
    assert (seams[0][:, 128 + mid - 20] > 0).mean() > 0.9
    assert (seams[1][:, mid + 20] > 0).mean() > 0.9


def test_dp_seam_covers():
    imgs, corners, masks = _overlap_pair()
    finder = SeamFinder("dp_color")
    seams = finder.find(imgs, corners, masks)
    s0 = seams[0][:, 128:] > 0
    s1 = seams[1][:, :128] > 0
    assert (s0 | s1).all()


def test_no_seam():
    imgs, corners, masks = _overlap_pair()
    finder = SeamFinder("no")
    seams = finder.find(imgs, corners, masks)
    assert (seams[0] == masks[0]).all()


def test_seam_resize():
    seam = np.zeros((64, 128), np.uint8)
    seam[:, :64] = 255
    mask = np.full((128, 256), 255, np.uint8)
    out = SeamFinder.resize(seam, mask)
    assert out.shape == (128, 256)
    assert (out[:, :100] > 0).all()
    assert (out[:, 140:] == 0).all()


def test_gain_compensation_recovers_exposure():
    rng = np.random.RandomState(0)
    base = rng.randint(60, 200, (128, 384, 3)).astype(np.float32)
    # image 2 is 20% darker
    img1 = base[:, :256].astype(np.uint8)
    img2 = np.clip(base[:, 128:] * 0.8, 0, 255).astype(np.uint8)
    corners = [(0, 0), (128, 0)]
    masks = [np.full((128, 256), 255, np.uint8)] * 2
    comp = ExposureErrorCompensator("gain")
    comp.feed(corners, [img1, img2], masks)
    g1, g2 = comp._gains[0][0], comp._gains[1][0]
    # relative gain should brighten image 2 vs image 1 by ~1/0.8
    assert 1.15 < g2 / g1 < 1.35
    out2 = comp.apply(1, corners[1], img2)
    assert out2.mean() > img2.mean() * 1.05


def test_block_gain_compensation_runs():
    imgs, corners, masks = _overlap_pair()
    comp = ExposureErrorCompensator("gain_blocks", block_size=32)
    comp.feed(corners, imgs, masks)
    out = comp.apply(0, corners[0], imgs[0])
    assert out.shape == imgs[0].shape
    comp2 = ExposureErrorCompensator("channel_blocks", block_size=32)
    comp2.feed(corners, imgs, masks)
    out2 = comp2.apply(1, corners[1], imgs[1])
    assert out2.shape == imgs[1].shape


def test_blocks_compensator_vs_cv2_oracle():
    """A/B the blocks compensator against cv.detail.BlocksGainCompensator
    on a shared synthetic scene: after compensation, the overlap mismatch
    must shrink to the same level the OpenCV implementation achieves (the
    cell discretizations differ — canvas-aligned cells vs per-image blocks
    — so we compare compensation QUALITY, not raw gain maps)."""
    import cv2

    from stitching_tpu.exposure_error_compensator import (
        ExposureErrorCompensator)

    rng = np.random.RandomState(3)
    base = rng.randint(40, 200, (160, 320, 3)).astype(np.float32)
    # image 1 sees columns [0:200), image 2 sees [120:320) 1.35x brighter
    img1 = np.clip(base[:, :200], 0, 255).astype(np.uint8)
    img2 = np.clip(base[:, 120:] * 1.35, 0, 255).astype(np.uint8)
    corners = [(0, 0), (120, 0)]
    masks = [np.full((160, 200), 255, np.uint8)] * 2

    def overlap_err(a1, a2):
        o1 = a1[:, 120:200].astype(np.float32)
        o2 = a2[:, 0:80].astype(np.float32)
        return float(np.abs(o1 - o2).mean())

    raw_err = overlap_err(img1, img2)

    comp = ExposureErrorCompensator("gain_blocks", block_size=32)
    comp.feed(corners, [img1, img2], masks)
    ours = [comp.apply(i, corners[i], img)
            for i, img in enumerate([img1, img2])]
    ours_err = overlap_err(*ours)

    ref = cv2.detail.BlocksGainCompensator()
    ref.feed(corners, [img1, img2], list(masks))
    refs = []
    for i, img in enumerate([img1, img2]):
        im = img.copy()
        ref.apply(i, corners[i], im, masks[i])
        refs.append(im)
    ref_err = overlap_err(*refs)

    # both must fix most of the mismatch; ours must be in cv2's league
    assert ours_err < 0.5 * raw_err, (ours_err, raw_err)
    assert ours_err <= 1.5 * ref_err + 2.0, (ours_err, ref_err, raw_err)


def test_dp_seam_ownership_vs_cv2_oracle():
    """DP seam A/B vs cv.detail_DpSeamFinder on a scene with a unique
    zero-mismatch corridor. Exact route parity is not the contract (OpenCV
    DpSeamFinder is a contour/region algorithm, not pure seam-carving);
    the contract validated here is (a) the partition is exact — kept
    regions tile the overlap with no gap and no two-owner pixels off the
    seam line, (b) our seam routes through the corridor, and (c) our
    seam's color-mismatch energy is no worse than the oracle's."""
    import cv2

    from stitching_tpu.ops.seam import dp_pairwise_seams

    rng = np.random.RandomState(11)
    scene = rng.randint(0, 255, (200, 460, 3)).astype(np.float32)
    img1 = scene[:, :300].copy()
    img2 = scene[:, 160:].copy()
    noise = rng.randint(20, 45, (200, 140, 3)).astype(np.float32)
    noise[:, 90:101] = 0  # the corridor: identical content
    img2[:, :140] = np.clip(img2[:, :140] + noise, 0, 255)
    corners = [(0, 0), (160, 0)]
    masks = [np.full((200, 300), 255, np.uint8) for _ in range(2)]

    ours = dp_pairwise_seams([img1, img2], corners, masks, use_grad=False)

    finder = cv2.detail_DpSeamFinder("COLOR")
    cv_out = [m.get() for m in finder.find(
        [cv2.UMat(im.astype(np.float32)) for im in (img1, img2)],
        corners, [cv2.UMat(m) for m in masks])]

    def seam_energy(kept):
        """Sum of |img1-img2| along the ownership boundary in the overlap."""
        o1 = kept[0][:, 160:300] > 0
        diff = np.abs(img1[:, 160:300] - img2[:, :140]).sum(-1)
        edge = o1[:, :-1] != o1[:, 1:]
        return float((diff[:, :-1] * edge).sum())

    # (a) exact partition: overlap fully covered, near-disjoint
    ov_union = (ours[0][:, 160:300] > 0) | (ours[1][:, :140] > 0)
    ov_both = (ours[0][:, 160:300] > 0) & (ours[1][:, :140] > 0)
    assert ov_union.all()
    assert ov_both.mean() < 0.02  # only the seam line itself

    # (b) our seam lives in the corridor: left image keeps the left side
    ov1 = ours[0][:, 160:300]
    ov2 = ours[1][:, 0:140]
    assert ov1[:, :85].mean() > 200
    assert ov2[:, 105:].mean() > 200

    # (c) our seam mismatch energy <= the oracle's
    assert seam_energy(ours) <= seam_energy(cv_out) + 1e-6


def _tile_stack_from(imgs, corners, masks):
    import jax.numpy as jnp

    from stitching_tpu.compose import TileStack
    b = len(imgs)
    th = max(m.shape[0] for m in masks)
    tw = max(m.shape[1] for m in masks)
    data = np.zeros((b, th, tw, 3), np.float32)
    mk = np.zeros((b, th, tw), np.float32)
    sizes = np.zeros((b, 2), np.int64)
    for i, (im, m) in enumerate(zip(imgs, masks)):
        h, w = m.shape
        data[i, :h, :w] = im
        mk[i, :h, :w] = m
        sizes[i] = (w, h)
    return TileStack(jnp.asarray(data), jnp.asarray(mk),
                     np.asarray(corners, np.int64), sizes)


def test_voronoi_stack_matches_host():
    """The device voronoi path (`find_stack`) must reproduce the host
    pairwise/global partition exactly (same nearest-unique-territory rule,
    same lower-index tie-breaking)."""
    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (160, 520, 3), np.uint8)
    imgs = [base[:, :256].copy(), base[:, 128:384].copy(),
            base[:, 264:].copy()]
    corners = [(0, 0), (128, 0), (264, 0)]
    masks = [np.full((160, 256), 255, np.uint8) for _ in range(3)]
    finder = SeamFinder("voronoi")
    host = finder.find(imgs, corners, masks)

    stack = _tile_stack_from(imgs, corners, masks)
    dev = np.asarray(finder.find_stack(stack))
    for i, m in enumerate(host):
        h, w = m.shape
        np.testing.assert_array_equal(dev[i, :h, :w] > 0, m > 0,
                                      err_msg=f"img {i}")


def test_gc_stack_matches_host_two_images():
    """For a two-image overlap the batched gc path sees the same inputs as
    the sequential host path -> identical cuts."""
    imgs, corners, masks = _overlap_pair()
    finder = SeamFinder("gc_color")
    host = finder.find(imgs, corners, masks)
    stack = _tile_stack_from(imgs, corners, masks)
    dev = np.asarray(finder.find_stack(stack))
    for i, m in enumerate(host):
        h, w = m.shape
        np.testing.assert_array_equal(dev[i, :h, :w] > 0, m > 0,
                                      err_msg=f"img {i}")


def test_gc_stack_covers_multi():
    """Multi-image batched gc: the seam masks must still tile the union
    (every covered canvas pixel owned by >= 1 image; exclusive regions
    keep their owner)."""
    rng = np.random.RandomState(9)
    base = rng.randint(0, 255, (96, 400, 3), np.uint8)
    imgs = [base[:, :192].copy(), base[:, 96:288].copy(),
            base[:, 208:].copy()]
    corners = [(0, 0), (96, 0), (208, 0)]
    masks = [np.full((96, 192), 255, np.uint8) for _ in range(3)]
    finder = SeamFinder("gc_color")
    stack = _tile_stack_from(imgs, corners, masks)
    dev = np.asarray(finder.find_stack(stack))
    canvas = np.zeros((96, 400), np.int32)
    for i, c in enumerate(corners):
        canvas[:, c[0]:c[0] + 192] += (dev[i, :96, :192] > 0)
    assert (canvas >= 1).all()   # full coverage
    # exclusive (non-overlap) territory always stays owned
    assert (dev[0, :96, :96] > 0).all()
    assert (dev[2, :96, 96:192] > 0).all()


def test_coverage_fallback_restores_orphans():
    """ensure_coverage: a covered canvas pixel that lost every owner (the
    cyclic >=3-overlap hazard of parallel keep application) reassigns to
    its lowest-index covering image; owned pixels are untouched."""
    import jax.numpy as jnp

    from stitching_tpu.ops.seam import ensure_coverage

    n, th, tw = 3, 64, 64
    corners = np.array([(0, 0), (32, 0), (64, 0)])
    sizes = np.array([(tw, th)] * n)
    orig = np.zeros((n, th, tw), np.float32)
    orig[:] = 255.0
    out = orig.copy()
    # orphan a patch covered by images 1 and 2 (canvas x 70..74 = tile-1
    # x 38..42 = tile-2 x 6..10); image 0 does not cover it
    out[1, 10:20, 38:43] = 0.0
    out[2, 10:20, 6:11] = 0.0
    # also a normally-owned pixel loses one owner only (no restore)
    out[1, 30, 40] = 0.0

    fixed = np.asarray(ensure_coverage(
        jnp.asarray(orig), jnp.asarray(out), corners, sizes))
    # orphaned patch restored to lowest covering index (image 1)
    assert (fixed[1, 10:20, 38:43] > 0).all()
    assert (fixed[2, 10:20, 6:11] == 0).all()
    # still-owned pixel untouched
    assert fixed[1, 30, 40] == 0
    assert fixed[2, 30, 8] > 0  # same canvas pixel owned by img 2
    # everything else unchanged
    assert (fixed[0] == out[0]).all()
