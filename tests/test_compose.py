"""Engine compositing kernels: content-exact slicing and gain application."""

import numpy as np
import jax.numpy as jnp

from stitching_tpu.compose import TileStack, slice_stack


def _stack_from(arrs):
    b = len(arrs)
    th = max(a.shape[0] for a in arrs)
    tw = max(a.shape[1] for a in arrs)
    data = np.zeros((b, th, tw, 3), np.float32)
    masks = np.zeros((b, th, tw), np.float32)
    sizes = np.zeros((b, 2), np.int64)
    for i, a in enumerate(arrs):
        h, w = a.shape[:2]
        data[i, :h, :w] = a
        masks[i, :h, :w] = 255
        sizes[i] = (w, h)
    return TileStack(jnp.asarray(data), jnp.asarray(masks),
                     np.zeros((b, 2), np.int64), sizes)


def test_slice_stack_content_exact():
    """Rect origins beyond (tile_dim - bucketed_crop_dim) must still slice
    the true content (regression: clamped origins shifted the content)."""
    # tile 1024 wide; rects (0,0,900,200) and (500,0,200,200): the second
    # rect's 128-bucketed width (256) once clamped used to start at col 0.
    base = np.zeros((256, 1024, 3), np.float32)
    base[:, :, 0] = np.arange(1024)[None, :]  # column index in channel 0
    stack = _stack_from([base, base])
    rects = [(0, 0, 900, 200), (500, 0, 200, 200)]
    out = slice_stack(stack, rects)
    got0 = np.asarray(out.data[0, :200, :900, 0])
    got1 = np.asarray(out.data[1, :200, :200, 0])
    np.testing.assert_allclose(got0, base[:200, :900, 0])
    np.testing.assert_allclose(got1, base[:200, 500:700, 0])
    assert tuple(out.sizes[0]) == (900, 200)
    assert tuple(out.sizes[1]) == (200, 200)


def test_slice_stack_bottom_right_rect():
    """A rect flush against the bottom/right edge is content-exact."""
    base = np.zeros((200, 300, 3), np.float32)
    base[:, :, 1] = np.arange(200)[:, None]  # row index in channel 1
    stack = _stack_from([base])
    out = slice_stack(stack, [(250, 150, 50, 50)])
    got = np.asarray(out.data[0, :50, :50, 1])
    np.testing.assert_allclose(got, base[150:200, 250:300, 1])


def test_strip_blend_matches_monolithic():
    """X-strip multiband tiling (memory-bounded canvases) must reproduce
    the monolithic blend exactly: strips include every window within the
    feed+collapse support margin of their interior."""
    import stitching_tpu.compose as compose
    from stitching_tpu.compose import blend_stack

    rng = np.random.RandomState(5)
    n = 8
    th, tw = 192, 256
    tiles, masks, corners, sizes = [], [], [], []
    arrs = []
    for i in range(n):
        a = rng.randint(0, 255, (th, tw, 3)).astype(np.float32)
        arrs.append(a)
        corners.append((i * 180, (i % 2) * 16))
        sizes.append((tw, th))
    b = len(arrs)
    data = np.zeros((b, th, tw, 3), np.float32)
    mk = np.full((b, th, tw), 255.0, np.float32)
    for i, a in enumerate(arrs):
        data[i] = a
    stack = TileStack(jnp.asarray(data), jnp.asarray(mk),
                      np.asarray(corners, np.int64),
                      np.asarray(sizes, np.int64))
    seams = stack.masks

    import os
    for kind in ("multiband", "feather", "no"):
        mono = np.asarray(blend_stack(stack, seams, kind, 5)[0])
        os.environ["STITCHING_TPU_BLEND_BUDGET"] = "1"  # force strips
        try:
            striped = np.asarray(blend_stack(stack, seams, kind, 5)[0])
        finally:
            del os.environ["STITCHING_TPU_BLEND_BUDGET"]
        assert striped.shape == mono.shape, kind
        diff = np.abs(striped.astype(int) - mono.astype(int))
        # identical up to uint8 rounding of float accumulation order
        assert diff.max() <= 1, (kind, diff.max(), (diff > 1).mean())


def test_stream_composite_matches_batched():
    """The streaming compositor (per-image donated-accumulator feeds) must
    reproduce `blend_stack` exactly for every blender kind: same plan, same
    per-image feed math, same accumulation order."""
    from stitching_tpu.compose import StreamComposite, blend_stack

    rng = np.random.default_rng(7)
    b, th, tw = 3, 128, 256
    data = rng.uniform(0, 255, (b, th, tw, 3)).astype(np.float32)
    masks = np.zeros((b, th, tw), np.float32)
    seams = np.zeros((b, th, tw), np.float32)
    sizes = np.asarray([(200, 100), (256, 128), (180, 90)], np.int64)
    corners = np.asarray([(0, 0), (150, 20), (310, 5)], np.int64)
    for i, (w, h) in enumerate(sizes):
        masks[i, :h, :w] = 255
        seams[i, :h, : (w * 2) // 3] = 255
    ts = TileStack(jnp.asarray(data), jnp.asarray(masks), corners, sizes)
    seams_d = jnp.asarray(seams)

    for kind in ("multiband", "feather", "no"):
        pano_b, mask_b = blend_stack(ts, seams_d, kind, 5)
        stream = StreamComposite(corners, sizes, kind, 5, th, tw)
        for i in range(b):
            stream.feed(i, ts.data[i], seams_d[i])
        pano_s, mask_s = stream.finish()
        np.testing.assert_array_equal(np.asarray(pano_b), np.asarray(pano_s),
                                      err_msg=kind)
        np.testing.assert_array_equal(np.asarray(mask_b), np.asarray(mask_s),
                                      err_msg=kind)


def test_ystrip_blend_matches_monolithic_and_streams():
    """Tall multi-row canvases strip along Y (the X windows span most of
    the width); stream_fetch returns the identical panorama as a host
    array."""
    import os

    from stitching_tpu.compose import blend_stack

    rng = np.random.RandomState(6)
    n = 16
    th, tw = 160, 256
    arrs, corners, sizes = [], [], []
    for r in range(8):
        for c in range(2):
            arrs.append(rng.randint(0, 255, (th, tw, 3)).astype(np.float32))
            corners.append((c * 200, r * 140))
            sizes.append((tw, th))
    data = np.stack(arrs)
    mk = np.full((n, th, tw), 255.0, np.float32)
    stack = TileStack(jnp.asarray(data), jnp.asarray(mk),
                      np.asarray(corners, np.int64),
                      np.asarray(sizes, np.int64))
    mono = np.asarray(blend_stack(stack, stack.masks, "multiband", 5)[0])
    os.environ["STITCHING_TPU_BLEND_BUDGET"] = "1"
    try:
        striped = np.asarray(
            blend_stack(stack, stack.masks, "multiband", 5)[0])
        streamed = blend_stack(stack, stack.masks, "multiband", 5,
                               stream_fetch=True)[0]
    finally:
        del os.environ["STITCHING_TPU_BLEND_BUDGET"]
    assert isinstance(streamed, np.ndarray)
    for got, label in ((striped, "striped"), (streamed, "streamed")):
        assert got.shape == mono.shape, label
        diff = np.abs(got.astype(int) - mono.astype(int))
        assert diff.max() <= 1, (label, diff.max())


def test_monolithic_stream_matches_monolithic():
    """Frontier-streamed giant-canvas blend (huge windows, no strip
    decomposition possible) equals the monolithic blend: band collapse
    with pyr_up halo is exact."""
    import os

    from stitching_tpu.compose import blend_stack

    rng = np.random.RandomState(8)
    th, tw = 256, 192
    arrs, corners, sizes = [], [], []
    for r in range(3):
        for c in range(2):
            arrs.append(rng.randint(0, 255, (th, tw, 3)).astype(np.float32))
            corners.append((c * 160, r * 220))
            sizes.append((tw, th))
    n = len(arrs)
    data = np.stack(arrs)
    mk = np.full((n, th, tw), 255.0, np.float32)
    stack = TileStack(jnp.asarray(data), jnp.asarray(mk),
                      np.asarray(corners, np.int64),
                      np.asarray(sizes, np.int64))
    for kind in ("multiband", "feather"):
        mono = np.asarray(blend_stack(stack, stack.masks, kind, 5)[0])
        os.environ["STITCHING_TPU_BLEND_BUDGET"] = "1"
        try:
            streamed = blend_stack(stack, stack.masks, kind, 5,
                                   stream_fetch=True)[0]
        finally:
            del os.environ["STITCHING_TPU_BLEND_BUDGET"]
        assert isinstance(streamed, np.ndarray), kind
        assert streamed.shape == mono.shape, kind
        diff = np.abs(streamed.astype(int) - mono.astype(int))
        assert diff.max() <= 1, (kind, diff.max(), (diff > 1).mean())


def test_stream_composite_frontier_fetch_matches():
    """X-frontier streaming (column bands fetched while later images feed)
    equals the batched blend for each kind."""
    from stitching_tpu.compose import StreamComposite, blend_stack

    rng = np.random.default_rng(11)
    b, th, tw = 6, 128, 192
    data = rng.uniform(0, 255, (b, th, tw, 3)).astype(np.float32)
    masks = np.full((b, th, tw), 255.0, np.float32)
    sizes = np.asarray([(tw, th)] * b, np.int64)
    corners = np.asarray([(i * 150, (i % 2) * 10) for i in range(b)],
                         np.int64)
    ts = TileStack(jnp.asarray(data), jnp.asarray(masks), corners, sizes)
    for kind in ("multiband", "feather", "no"):
        pano_b, mask_b = blend_stack(ts, ts.masks, kind, 5)
        stream = StreamComposite(corners, sizes, kind, 5, th, tw,
                                 frontier_fetch=True)
        for i in range(b):
            stream.feed(i, ts.data[i], ts.masks[i])
        pano_s, mask_s = stream.finish(stream_fetch=True)
        assert isinstance(pano_s, np.ndarray), kind
        np.testing.assert_array_equal(np.asarray(pano_b), pano_s,
                                      err_msg=kind)
        np.testing.assert_array_equal(np.asarray(mask_b), mask_s,
                                      err_msg=kind)


def test_fetch_image_chunked_roundtrip():
    """fetch_image chunks transfers above 2x the sweet-spot RPC size;
    the reassembled host image must be exact."""
    import jax.numpy as jnp

    from stitching_tpu.compose import _FETCH_CHUNK, fetch_image

    rng = np.random.RandomState(3)
    h = (3 * _FETCH_CHUNK) // (1024 * 3) + 7     # > 2 chunks of u8
    img = rng.randint(0, 255, (h, 1024, 3), np.uint8)
    out = fetch_image(jnp.asarray(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)
    # host arrays pass through untouched
    assert fetch_image(img) is img
