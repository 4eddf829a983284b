"""The batched stitching engine: registration + composition as staged,
device-resident array programs.

This is the architectural core the `Stitcher` facade drives. Unlike the
reference's orchestration (`stitching/stitcher.py:94-128`), which walks
per-image lazy generators with a host round-trip between every stage, the
engine works on STACKS:

1. originals upload once as one padded (B, H, W, C) device stack;
2. every resolution change is one batched resize kernel (`pipeline.py`);
3. registration (detect, match+RANSAC) is two batched dispatches;
4. camera math (estimate, bundle-adjust, wave-correct) runs on tiny
   per-camera tensors;
5. the LOW pass (crop planning, exposure stats, seam search) warps all
   images in one dispatch and pulls the small LOW tiles to host ONCE;
6. the FINAL pass (warp, crop, gain, seam upscale, blend) never leaves the
   device: `compose.py` kernels end-to-end, one uint8 transfer at the end.

Intermediate state is carried in explicit immutable dataclasses
(`Registration`, `CompositionPlan`) rather than object attributes, so each
stage is a pure, separately testable function. Resolution semantics (MEDIUM
registration / LOW planning / FINAL compositing) and all error/warning
contracts match the reference (`stitching/stitcher.py:94-128`, `images.py`).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import profiling as prof
from .compose import (TileStack, apply_gains_stack, blend_stack, fetch_image,
                      resize_seam_masks_stack, slice_stack, warp_stack)
from .images import Images
from .pipeline import resize_stack, stack_images
from .subsetter import Subsetter
from .warper import Warper

Resolution = Images.Resolution


@dataclasses.dataclass
class Registration:
    """Everything the registration pass decides."""

    images: object          # Images (subset applied)
    stack: object           # DeviceStack of ORIGINAL-resolution images
    features: list
    matches: list
    cameras: list
    scale: float            # canvas scale (median focal)


@dataclasses.dataclass
class CompositionPlan:
    """LOW-pass products needed to composite at FINAL resolution."""

    seam_masks_low: list    # per-image uint8 seam masks (LOW, host)
    crop_rects: list | None  # per-image Rectangle at LOW res, or None
    lir_aspect: float


# ---------------------------------------------------------------------------
# Registration
# ---------------------------------------------------------------------------

def _mesh_of(st):
    return getattr(st, "mesh", None)


def register(st, images, feature_masks=()):
    """MEDIUM-resolution registration: one detect dispatch, one match
    dispatch, then small-tensor camera estimation.

    Transfer scheduling: the MEDIUM stack (host-resized, ~the upload bytes
    of one image) uploads FIRST so detection starts immediately; the big
    ORIGINAL stack upload is enqueued right after and streams to the device
    WHILE registration computes — on hosts where the host->device link is
    the bottleneck (tunneled TPUs), the original upload is fully hidden
    behind detect/match/BA."""
    from .ops.resize import resize as _host_resize

    mesh = _mesh_of(st)
    images_obj = Images.of(
        images, st.medium_megapix, st.low_megapix, st.final_megapix)
    with prof.stage_timer("registration/upload"):
        originals = [np.asarray(img) for img in images_obj]
        n = len(originals)
        med_sizes = images_obj.get_scaled_img_sizes(Resolution.MEDIUM)
        orig_sizes = [(im.shape[1], im.shape[0]) for im in originals]
        stack = None
        if list(map(tuple, med_sizes)) == orig_sizes:
            stack = stack_images(originals, mesh)
            medium = stack
        else:
            with prof.stage_timer("registration/resize_medium"):
                medium_imgs = [
                    _host_resize(im, size)
                    for im, size in zip(originals, med_sizes)]
            medium = stack_images(medium_imgs, mesh)
    with prof.stage_timer("registration/detect"):
        masks_medium = _prepare_feature_masks(st, feature_masks, medium, n)
        features = st.detector.detect_on_stack(medium, masks_medium)[:n]
    if stack is None:
        # enqueue the big ORIGINAL upload only now, AFTER the detect fetch:
        # host->device and device->host ride the same transfer link on
        # tunneled setups, so queueing it earlier would stall the detect
        # result fetch; from here it streams during match/estimate/BA
        with prof.stage_timer("registration/upload"):
            stack = stack_images(originals, mesh)
    with prof.stage_timer("registration/match"):
        matches = st.matcher.match_features(features, mesh=mesh)
    with prof.stage_timer("registration/subset"):
        indices = st.subsetter.subset(images_obj.names, features, matches)
        features = Subsetter.subset_list(features, indices)
        matches = Subsetter.subset_matches(matches, indices)
        images_obj.subset(indices)
        if len(indices) < n:
            stack = _subset_stack(stack, indices, mesh)
    with prof.stage_timer("registration/estimate"):
        cameras = st.camera_estimator.estimate(features, matches)
    with prof.stage_timer("registration/bundle_adjust"):
        st.camera_adjuster.mesh = mesh
        cameras = st.camera_adjuster.adjust(features, matches, cameras)
    with prof.stage_timer("registration/wave_correct"):
        cameras = st.wave_corrector.correct(cameras)
    st.warper.set_scale(cameras)
    return Registration(images_obj, stack, features, matches, cameras,
                        st.warper.scale)


def _pad_sizes(sizes, b):
    out = np.ones((b, 2), np.int32)
    out[:len(sizes)] = np.asarray(sizes, np.int32)
    return out


def _subset_stack(stack, indices, mesh):
    """Gather the kept images, re-padding the batch to the mesh size."""
    from .pipeline import _shard_batch, pad_batch

    idx = list(indices)
    b2 = pad_batch(len(idx), mesh)
    idx_full = np.asarray(idx + [idx[-1]] * (b2 - len(idx)))
    data = stack.data[jnp.asarray(idx_full)] if mesh is None \
        else _shard_batch(stack.data[jnp.asarray(idx_full)], mesh)
    sizes = np.ones((b2, 2), stack.sizes.dtype)
    sizes[:len(idx)] = stack.sizes[np.asarray(idx)]
    # padded duplicate slots get size (1, 1); every downstream kernel
    # masks them out via the true-size metadata
    return dataclasses.replace(stack, data=data, sizes=sizes)


def _prepare_feature_masks(st, feature_masks, medium_stack, n):
    """Resize user feature masks to MEDIUM and validate sizes."""
    from .errors import StitchingError

    if not feature_masks or len(feature_masks) == 0:
        return None
    masks_obj = Images.of(list(feature_masks), st.medium_megapix,
                          st.low_megapix, st.final_megapix)
    masks = [Images.to_binary(m)
             for m in masks_obj.resize(Resolution.MEDIUM)]
    if len(masks) != n:
        raise StitchingError("image and mask lists must be of same length")
    for idx, m in enumerate(masks):
        w, h = medium_stack.sizes[idx]
        if m.shape[0] != h or m.shape[1] != w:
            raise StitchingError(
                f"Resolution of mask {idx + 1} {m.shape} does not match"
                f" the resolution of image {idx + 1} {(h, w)}.")
    return masks


# ---------------------------------------------------------------------------
# Warping helpers
# ---------------------------------------------------------------------------

def warp_resolution(st, reg: Registration, resolution) -> TileStack:
    """Resize the original stack to `resolution` and warp every image onto
    the compositing surface — two dispatches total."""
    sizes = reg.images.get_scaled_img_sizes(resolution)
    resized = resize_stack(reg.stack, _pad_sizes(sizes, reg.stack.batch))
    aspect = reg.images.get_ratio(Resolution.MEDIUM, resolution)
    Ks = [Warper.get_K(cam, aspect) for cam in reg.cameras]
    Rs = [cam.R for cam in reg.cameras]
    return warp_stack(resized.data, resized.sizes, Ks, Rs,
                      reg.scale * aspect, st.warper.warper_type)


def _crop_tiles(ts: TileStack, cropper, aspect) -> TileStack:
    """Apply the prepared cropper's per-image rects at `aspect` scale."""
    rects = [r.times(aspect) for r in cropper.intersection_rectangles]
    corners, sizes = cropper.crop_rois(
        [tuple(c) for c in ts.corners],
        [tuple(s) for s in ts.sizes], aspect)
    out = slice_stack(ts, [tuple(r) for r in rects])
    return dataclasses.replace(out, corners=np.asarray(corners),
                               sizes=np.asarray(sizes, np.int64))


# ---------------------------------------------------------------------------
# LOW pass: crop planning, exposure stats, seam search
# ---------------------------------------------------------------------------

def plan_composition(st, reg: Registration) -> CompositionPlan:
    with prof.stage_timer("low/warp"):
        low = warp_resolution(st, reg, Resolution.LOW)
    with prof.stage_timer("low/crop"):
        if st.cropper.do_crop:
            _, pano_mask = blend_stack(low, None, "no", 0, _mesh_of(st))
            st.cropper.prepare_from_mask(
                np.asarray(pano_mask), [tuple(c) for c in low.corners],
                [tuple(s) for s in low.sizes])
            low = _crop_tiles(low, st.cropper, 1)
        lir_aspect = reg.images.get_ratio(Resolution.LOW, Resolution.FINAL)
    with prof.stage_timer("low/exposure_feed"):
        st.compensator.feed_stack([tuple(c) for c in low.corners], low)
    with prof.stage_timer("low/seam_find"):
        seam_masks = st.seam_finder.find_stack(low)
        if isinstance(seam_masks, jnp.ndarray):
            seam_masks = (seam_masks, np.asarray(low.sizes))
    return CompositionPlan(
        seam_masks, st.cropper.intersection_rectangles
        if st.cropper.do_crop else None, lir_aspect)


# ---------------------------------------------------------------------------
# FINAL pass: fully device-resident compositing
# ---------------------------------------------------------------------------

def composite(st, reg: Registration, plan: CompositionPlan):
    with prof.stage_timer("final/warp"):
        fin = warp_resolution(st, reg, Resolution.FINAL)
        # the original-resolution stack has no further consumers: drop the
        # reference so its device buffers free before the blend allocates
        # (reference memory contract analog: one working set in flight,
        # stitching/stitcher.py:216-254)
        reg.stack = None
    with prof.stage_timer("final/crop"):
        if plan.crop_rects is not None:
            fin = _crop_tiles(fin, st.cropper, plan.lir_aspect)

    if st.timelapser.do_timelapse:
        with prof.stage_timer("final/timelapse"):
            corners = [tuple(c) for c in fin.corners]
            sizes = [tuple(s) for s in fin.sizes]
            st.timelapser.initialize(corners, sizes)
            imgs, _ = fin.to_host()
            for name, img, corner in zip(reg.images.names, imgs, corners):
                st.timelapser.process_and_save_frame(
                    name, np.clip(np.round(img), 0, 255).astype(np.uint8),
                    corner)
        return None

    with prof.stage_timer("final/gain_apply"):
        fin = apply_gains_stack(fin, st.compensator)
    with prof.stage_timer("final/seam_resize"):
        seams = resize_seam_masks_stack(plan.seam_masks_low, fin)
    with prof.stage_timer("final/blend"):
        pano_dev, _ = blend_stack(fin, seams, st.blender.blender_type,
                                  st.blender.blend_strength, _mesh_of(st))
    with prof.stage_timer("final/download"):
        pano = fetch_image(pano_dev)
    return pano


def run(st, images, feature_masks=()):
    """The full pipeline: register -> plan -> composite."""
    reg = register(st, images, feature_masks)
    plan = plan_composition(st, reg)
    return composite(st, reg, plan)
