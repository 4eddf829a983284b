"""The batched stitching engine: registration + composition as staged,
device-resident array programs scheduled around the host<->device link.

This is the architectural core the `Stitcher` facade drives. Unlike the
reference's orchestration (`stitching/stitcher.py:94-128`), which walks
per-image lazy generators with a host round-trip between every stage, the
engine treats the transfer link as the scarce resource (on tunneled TPUs it
IS the wall clock) and overlaps everything against it:

1. the bulk ORIGINAL upload starts at t=0 and chunk-streams in the
   background for the entire run (`transfer.Uploader`);
2. registration works on small host-downscaled stacks uploaded with lane
   priority — a GRAY medium stack (detection reads luma only) and a color
   LOW stack — and syncs the host exactly once (fused detect-fields +
   match-results fetch); camera math (estimate, LM bundle-adjust, wave)
   runs slower-but-parallel behind the stream;
3. the LOW pass (crop planning, exposure stats, seam search) is batched
   dispatches over the LOW stack, device-resident for every seam finder;
4. the FINAL pass streams per image: resize -> warp -> crop -> gain ->
   seam upscale -> blend feed dispatch the moment each image's upload
   lands (`compose.StreamComposite`, donated accumulators), and the
   panorama collapses + fetches in row bands so the final transfer
   overlaps the final compute;
5. the mesh/SPMD path keeps one-shot sharded stack uploads and batched
   dispatches (pair-parallel registration, strip-sharded blending).

Intermediate state is carried in explicit immutable dataclasses
(`Registration`, `CompositionPlan`) rather than object attributes, so each
stage is a pure, separately testable function. Resolution semantics (MEDIUM
registration / LOW planning / FINAL compositing) and all error/warning
contracts match the reference (`stitching/stitcher.py:94-128`, `images.py`).
"""

import dataclasses

import jax
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
    # async single-chip path: originals stream up in the background while
    # registration computes; LOW-resolution stack pre-uploaded for the
    # seam/exposure planning pass (`transfer.Uploader` scheduling)
    uploader: object = None
    low_stack: object = None


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


def register(st, images, feature_masks=(), prestaged=None):
    """MEDIUM-resolution registration.

    Three paths:
    - async (single chip, downscaled registration — the production shape):
      `_register_async` — ONE host sync for the whole registration, with
      the bulk ORIGINAL upload chunk-streamed in the background
      (`transfer.Uploader`).
    - sync (mesh/SPMD, or inputs already at MEDIUM size): stacked one-shot
      uploads with per-stage fetches.
    - device-resident (`prestaged` = a DeviceStack of the originals): no
      image uploads at all — the MEDIUM resize runs ON DEVICE from the
      prestaged stack. This is the tunnel-robust benchmark mode
      (bench.py device_mps) and the natural mode when inputs are already
      device-resident (e.g. produced by an upstream device pipeline).
    """
    mesh = _mesh_of(st)
    images_obj = Images.of(
        images, st.medium_megapix, st.low_megapix, st.final_megapix)
    originals = [np.asarray(img) for img in images_obj]
    n = len(originals)
    med_sizes = images_obj.get_scaled_img_sizes(Resolution.MEDIUM)
    orig_sizes = [(im.shape[1], im.shape[0]) for im in originals]
    same = list(map(tuple, med_sizes)) == orig_sizes
    if prestaged is None and mesh is None and not same:
        return _register_async(st, images_obj, originals, med_sizes,
                               feature_masks)
    return _register_sync(st, images_obj, originals, med_sizes, same,
                          feature_masks, mesh, prestaged=prestaged)


def _register_sync(st, images_obj, originals, med_sizes, same,
                   feature_masks, mesh, prestaged=None):
    """One-shot stacked uploads (mesh/SPMD path and tiny-input path)."""
    from .ops.resize import resize as _host_resize

    n = len(originals)
    with prof.stage_timer("registration/upload"):
        stack = None
        if prestaged is not None:
            stack = prestaged
            medium = stack if same else resize_stack(
                stack, _pad_sizes(med_sizes, stack.batch))
        elif same:
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
        # host->device uploads are FIFO through the link, so queueing it
        # earlier would stall the small transfers registration needs
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
    return _register_cameras(st, images_obj, stack, features, matches, mesh)


def _register_async(st, images_obj, originals, med_sizes, feature_masks):
    """Transfer-scheduled registration (single chip).

    Timeline (the link is FIFO per direction, full duplex — see
    `transfer.py`): a small GRAY MEDIUM stack (detection reads only luma)
    plus the COLOR LOW stack upload first so the whole detect+match device
    chain dispatches immediately; the 10x bigger ORIGINAL upload then
    streams in chunks behind them, overlapped with registration compute
    and fetches; registration itself syncs the host exactly once (fused
    detection-fields + match-results device_get). Bundle adjustment's
    small problem upload preempts the chunk stream via the uploader's
    yield lane.
    """
    from .ops.resize import resize as _host_resize
    from .transfer import Uploader

    n = len(originals)
    low_sizes = images_obj.get_scaled_img_sizes(Resolution.LOW)
    # The ORIGINAL upload is the wall-clock critical path (it gates the
    # last FINAL-pass feed): start it at t=0 so it streams during the host
    # downscales and all of registration. Everything that gates earlier
    # work (the MEDIUM/LOW stacks, detect/match inputs) preempts the chunk
    # stream through the uploader's yield lane.
    uploader = Uploader(originals)
    with prof.stage_timer("registration/resize_medium"):
        med_gray, low_imgs = _host_downscale(
            originals, med_sizes, low_sizes, _host_resize)
    with uploader.yield_lane():
        with prof.stage_timer("registration/upload"):
            medium = stack_images(med_gray)
            low_stack = stack_images(low_imgs)
            prof.fence(medium.data, low_stack.data)
        with prof.stage_timer("registration/detect"):
            masks_medium = _prepare_feature_masks(
                st, feature_masks, medium, n)
            feats_dev = st.detector.detect_on_stack_dispatch(
                medium, masks_medium)
            prof.fence(feats_dev)
        with prof.stage_timer("registration/match_dispatch"):
            pair_ij, chunks = st.matcher.match_stacked_dispatch(
                {k: feats_dev[k] for k in ("desc", "valid", "xy")},
                np.asarray(med_sizes, np.float32), st.detector.is_binary,
                n_images=n)
    with prof.stage_timer("registration/match"):
        # the single registration host sync: detection fields + match
        # results in one fused device_get (rides the download direction,
        # concurrent with the upload stream)
        fetch = {"small": {k: feats_dev[k] for k in
                           ("xy", "response", "size", "angle_deg", "valid")}}
        if chunks is not None:
            fetch["match"] = [c[0] for c in chunks]
        host = jax.device_get(fetch)
        features = st.detector.features_from_host(
            feats_dev["desc"], host["small"], med_sizes)
        res = None
        if chunks is not None:
            hcs = [{k: np.asarray(v)[:nv] for k, v in hc.items()}
                   for hc, (_, nv) in zip(host["match"], chunks)]
            res = {k: np.concatenate([c[k] for c in hcs]) for k in hcs[0]}
        matches = st.matcher.matches_from_host(pair_ij, res, n)
    with prof.stage_timer("registration/subset"):
        indices = st.subsetter.subset(images_obj.names, features, matches)
        features = Subsetter.subset_list(features, indices)
        matches = Subsetter.subset_matches(matches, indices)
        images_obj.subset(indices)
        if len(indices) < n:
            uploader.subset(indices)
            low_stack = _subset_stack(low_stack, indices, None)
    return _register_cameras(st, images_obj, None, features, matches, None,
                             uploader=uploader, low_stack=low_stack)


def _register_cameras(st, images_obj, stack, features, matches, mesh,
                      uploader=None, low_stack=None):
    """Shared tail: estimate -> bundle-adjust -> wave-correct -> scale."""
    # estimate/BA/wave dispatch small device programs whose argument
    # uploads queue behind up to `depth` in-flight ORIGINAL chunks
    # (~150 ms). That latency is deliberately NOT preempted: the original
    # upload is the critical path gating the last FINAL feed, so pausing
    # it would idle the link to speed up camera math that only has to
    # finish BEFORE the upload does — slower-but-parallel is free here.
    with prof.stage_timer("registration/estimate"):
        cameras = st.camera_estimator.estimate(features, matches)
    with prof.stage_timer("registration/bundle_adjust"):
        st.camera_adjuster.mesh = mesh
        cameras = st.camera_adjuster.adjust(features, matches, cameras)
    with prof.stage_timer("registration/wave_correct"):
        cameras = st.wave_corrector.correct(cameras)
    st.warper.set_scale(cameras)
    return Registration(images_obj, stack, features, matches, cameras,
                        st.warper.scale, uploader=uploader,
                        low_stack=low_stack)


def _host_downscale(originals, med_sizes, low_sizes, _host_resize):
    """Threaded host downscales: GRAY at MEDIUM (detection input — luma
    only, 3x less upload) and COLOR at LOW (seam/exposure planning input).

    Gray uses the BT.601 weights of the device path
    (`ops/color.bgr_to_gray`) in 8.8 fixed point — 4x faster than the f32
    formula on this host, off by at most 1 LSB, and converting BEFORE the
    resize makes the medium resize single-channel (3x less host work; both
    ops are linear so the order is exact).
    """
    import concurrent.futures as cf

    def gray_med(im, size):
        if im.ndim == 3:
            im16 = im.astype(np.uint16)
            im = ((29 * im16[..., 0] + 150 * im16[..., 1]
                   + 77 * im16[..., 2] + 128) >> 8).astype(np.uint8)
        return _host_resize(im, size)

    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        med = pool.map(gray_med, originals, med_sizes)
        low = pool.map(_host_resize, originals, low_sizes)
        return list(med), list(low)


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
    """Resize the stack to `resolution` and warp every image onto the
    compositing surface.

    Async path: LOW warps the pre-uploaded LOW stack directly; FINAL
    streams per-image resize+warp dispatches paced by the background
    original upload (`compose.warp_stack_streamed`). Sync path: two
    batched dispatches."""
    sizes = reg.images.get_scaled_img_sizes(resolution)
    aspect = reg.images.get_ratio(Resolution.MEDIUM, resolution)
    Ks = [Warper.get_K(cam, aspect) for cam in reg.cameras]
    Rs = [cam.R for cam in reg.cameras]
    scale = reg.scale * aspect
    wt = st.warper.warper_type
    if reg.uploader is not None:
        if resolution == Resolution.LOW and reg.low_stack is not None:
            low = reg.low_stack
            return warp_stack(low.data, low.sizes, Ks, Rs, scale, wt)
        from .compose import warp_stack_streamed

        return warp_stack_streamed(reg.uploader, sizes, Ks, Rs, scale, wt)
    resized = resize_stack(reg.stack, _pad_sizes(sizes, reg.stack.batch))
    return warp_stack(resized.data, resized.sizes, Ks, Rs, scale, wt)


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
        prof.fence(low.data, low.masks)
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
        prof.fence(seam_masks)
        if isinstance(seam_masks, jnp.ndarray):
            seam_masks = (seam_masks, np.asarray(low.sizes))
    return CompositionPlan(
        seam_masks, st.cropper.intersection_rectangles
        if st.cropper.do_crop else None, lir_aspect)


# ---------------------------------------------------------------------------
# FINAL pass: fully device-resident compositing
# ---------------------------------------------------------------------------

def _stream_fits_budget(st, reg, plan):
    """Stream only when the monolithic accumulators fit the blend budget;
    beyond it the batched path's X-strip decomposition takes over.

    The estimate mirrors `StreamComposite.__init__`'s actual allocations
    (pyramid-aligned ph x pw from `_plan_blend`, true channel count) —
    estimating from the unpadded canvas under-counted near the budget
    boundary and could commit to over-budget accumulators."""
    from .compose import (_blend_budget_bytes, _plan_blend, _round_up,
                          plan_warp_rois)

    aspect = reg.images.get_ratio(Resolution.MEDIUM, Resolution.FINAL)
    Ks = [Warper.get_K(cam, aspect) for cam in reg.cameras]
    Rs = [cam.R for cam in reg.cameras]
    sizes = [tuple(map(int, s))
             for s in reg.images.get_scaled_img_sizes(Resolution.FINAL)]
    corners, dsizes = plan_warp_rois(sizes, Ks, Rs, reg.scale * aspect,
                                     st.warper.warper_type)
    # uncropped ROIs: equal to the streamed plan without crop, a slight
    # over-estimate with crop (safe direction — falls back to strips)
    th = _round_up(int(dsizes[:, 1].max()), 64)
    tw = _round_up(int(dsizes[:, 0].max()), 64)
    p = _plan_blend(corners, dsizes, len(dsizes), st.blender.blender_type,
                    st.blender.blend_strength, th, tw)
    C = reg.uploader.channels if reg.uploader is not None else 3
    if p["kind"] == "multiband":
        acc_bytes = sum((p["ph"] >> lv) * (p["pw"] >> lv) * (C + 1) * 4
                        for lv in range(p["nb"] + 1))
    else:
        acc_bytes = p["ph"] * p["pw"] * (C + 1) * 4
    return acc_bytes <= _blend_budget_bytes()


def composite(st, reg: Registration, plan: CompositionPlan, fetch=True):
    """FINAL-resolution compositing. fetch=False returns the panorama as
    a DEVICE uint8 array (device-resident mode — no download on the
    critical path; callers fetch on demand via `compose.fetch_image`)."""
    if (reg.uploader is not None and not st.timelapser.do_timelapse
            and _mesh_of(st) is None and _stream_fits_budget(st, reg, plan)):
        return _composite_streamed(st, reg, plan)
    with prof.stage_timer("final/warp"):
        fin = warp_resolution(st, reg, Resolution.FINAL)
        prof.fence(fin.data, fin.masks)
        # the original-resolution images have no further consumers: drop
        # the references so their device buffers free before the blend
        # allocates (reference memory contract analog: one working set in
        # flight, stitching/stitcher.py:216-254)
        reg.stack = None
        reg.uploader = None
        reg.low_stack = None
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
        prof.fence(fin.data)
    with prof.stage_timer("final/seam_resize"):
        seams = resize_seam_masks_stack(plan.seam_masks_low, fin)
        prof.fence(seams)
    with prof.stage_timer("final/blend"):
        # single chip: over-budget canvases stream their fetch (strip- or
        # frontier-banded), returning a host array fetch_image passes through
        pano_dev, _ = blend_stack(fin, seams, st.blender.blender_type,
                                  st.blender.blend_strength, _mesh_of(st),
                                  stream_fetch=fetch
                                  and _mesh_of(st) is None)
        prof.fence(pano_dev)
    if not fetch:
        return pano_dev
    with prof.stage_timer("final/download"):
        pano = fetch_image(pano_dev)
    return pano


def _composite_streamed(st, reg: Registration, plan: CompositionPlan):
    """FINAL pass streamed per image (async single-chip path).

    Each image's resize -> warp -> crop -> gain -> seam-upscale -> blend
    feed dispatches the moment its background upload lands
    (`transfer.Uploader` pacing + `compose.StreamComposite` donated
    accumulators), so compositing overlaps the dominant FINAL-resolution
    upload; after the LAST image lands only one feed chain, the collapse
    and the uint8 fetch remain. This is the reference's lazy one-image-
    in-flight FINAL loop (stitching/stitcher.py:216-254) re-cast as
    transfer scheduling: same bounded working set, no host round-trips.
    """
    from .compose import (StreamComposite, _gain_map_kernel,
                          _gain_mul_kernel, _round_up, _seam_resize_kernel,
                          _slice_stack_kernel, plan_gain_arrays,
                          plan_warp_rois, warp_single)

    n = len(reg.cameras)
    with prof.stage_timer("final/plan"):
        sizes = [tuple(map(int, s))
                 for s in reg.images.get_scaled_img_sizes(Resolution.FINAL)]
        aspect = reg.images.get_ratio(Resolution.MEDIUM, Resolution.FINAL)
        Ks = [Warper.get_K(cam, aspect) for cam in reg.cameras]
        Rs = [cam.R for cam in reg.cameras]
        scale = reg.scale * aspect
        wt = st.warper.warper_type
        corners, dsizes = plan_warp_rois(sizes, Ks, Rs, scale, wt)
        th = _round_up(int(dsizes[:, 1].max()), 64)
        tw = _round_up(int(dsizes[:, 0].max()), 64)

        crop = plan.crop_rects is not None
        if crop:
            rects = [tuple(r.times(plan.lir_aspect))
                     for r in st.cropper.intersection_rectangles]
            ccorn, csz = st.cropper.crop_rois(
                [tuple(c) for c in corners], [tuple(s) for s in dsizes],
                plan.lir_aspect)
            fin_corners = np.asarray(ccorn)
            fin_sizes = np.asarray(csz, np.int64)
            ch = _round_up(max(r[3] for r in rects), 64)
            cw = _round_up(max(r[2] for r in rects), 64)
            pad_h = max(0, max(r[1] for r in rects) + ch - th)
            pad_w = max(0, max(r[0] for r in rects) + cw - tw)
            pad_h = _round_up(pad_h) if pad_h else 0
            pad_w = _round_up(pad_w) if pad_w else 0
            fth, ftw = ch, cw
        else:
            fin_corners, fin_sizes = np.asarray(corners), np.asarray(dsizes)
            fth, ftw = th, tw

        C = reg.uploader.channels
        gain_mode, gain_arrs = plan_gain_arrays(
            st.compensator, fin_sizes, n, C)

        # LOW seam masks as one device stack (already device for dp;
        # host lists from gc/voronoi upload once here — they are tiny)
        seam_src = plan.seam_masks_low
        if isinstance(seam_src, tuple):
            lo_dev, lo_sizes = seam_src
            lsz = np.ones((lo_dev.shape[0], 2), np.int32)
            lsz[:len(lo_sizes)] = np.asarray(lo_sizes, np.int32)
        else:
            lh = _round_up(max(m.shape[0] for m in seam_src), 64)
            lw = _round_up(max(m.shape[1] for m in seam_src), 64)
            lo_h = np.zeros((n, lh, lw), np.float32)
            lsz = np.ones((n, 2), np.int32)
            for i, m in enumerate(seam_src):
                h, w = m.shape[:2]
                lo_h[i, :h, :w] = m
                lsz[i] = (w, h)
            lo_dev = jnp.asarray(lo_h)
        fsz = np.asarray(fin_sizes, np.int32)

        # frontier emission pays when device->host transfers are slow
        # (tunneled/remote devices); on the CPU backend host==device and
        # the extra band collapses are pure overhead
        stream = StreamComposite(fin_corners, fin_sizes,
                                 st.blender.blender_type,
                                 st.blender.blend_strength, fth, ftw, C,
                                 frontier_fetch=jax.default_backend()
                                 != "cpu")

    with prof.stage_timer("final/stream"):
        for i in range(n):
            with prof.stage_timer("final/upload_wait"):
                raw = reg.uploader.image(i)  # paced by the bg upload
            tile, mask = warp_single(raw, sizes[i], Ks[i], Rs[i],
                                     corners[i], dsizes[i], scale, wt,
                                     th, tw, channels=C)
            if crop:
                xy = np.asarray([[rects[i][0], rects[i][1]]], np.int32)
                tile, mask = _slice_stack_kernel(
                    tile, mask, jnp.asarray(xy), ch=ch, cw=cw,
                    pad_h=pad_h, pad_w=pad_w)
            if gain_mode == "scalar":
                tile = _gain_mul_kernel(tile, jnp.asarray(gain_arrs[i:i + 1]))
            elif gain_mode == "map":
                gstack, cell0, inv_bs = gain_arrs
                tile = _gain_map_kernel(
                    tile, jnp.asarray(gstack[i:i + 1]),
                    jnp.asarray(cell0[i:i + 1]),
                    jnp.asarray(inv_bs[i:i + 1]))
            seam = _seam_resize_kernel(
                lo_dev[i:i + 1], jnp.asarray(lsz[i:i + 1]), mask,
                jnp.asarray(fsz[i:i + 1]))
            stream.feed(i, tile[0], seam[0])
        # originals have no further consumers: free the upload buffers
        reg.uploader = None
        reg.low_stack = None
        prof.fence(stream.state)
    with prof.stage_timer("final/blend"):
        # banded collapse with the fetch overlapped (host result)
        pano, _ = stream.finish(stream_fetch=True)
    return pano


def run(st, images, feature_masks=()):
    """The full pipeline: register -> plan -> composite."""
    reg = register(st, images, feature_masks)
    plan = plan_composition(st, reg)
    return composite(st, reg, plan)


def run_device(st, images, feature_masks=(), prestaged=None):
    """Device-resident pipeline: inputs pre-staged on device (or staged
    once here), panorama returned as a DEVICE uint8 array — no image
    transfers on the pipeline path. `prestaged`: a `pipeline.DeviceStack`
    of the ORIGINAL-resolution images (padded batch allowed); when None,
    the originals are staged with one upload first.

    This is the tunnel-robust pipeline measurement mode (bench.py
    `device_mps`) and the natural entry point when inputs already live on
    device. Fetch the result on demand with `compose.fetch_image`."""
    if prestaged is None:
        imgs_list = [np.asarray(im) for im in images]
        prestaged = stack_images(imgs_list, _mesh_of(st))
    reg = register(st, images, feature_masks, prestaged=prestaged)
    plan = plan_composition(st, reg)
    return composite(st, reg, plan, fetch=False)
