"""Host<->device transfer scheduling for high-latency (tunneled) links.

The reference never schedules transfers — its data lives in host memory and
OpenCV reads it in place. On a TPU behind a network tunnel the link is the
scarcest resource (~40 MB/s each way, full duplex, strictly FIFO per
direction), so WHO uploads WHEN decides end-to-end wall clock. Measured
semantics this module is built around (scripts/probe_async.py):

- `jax.device_put` is async (returns in ~1 ms for 46 MB) but the transfer
  queue is FIFO: a small urgent upload enqueued behind a big one waits for
  the whole big transfer. Chunking bulk uploads is the only way to give
  small transfers a timely slot.
- Uploads and downloads ride separate directions of a full-duplex link:
  fetches never contend with uploads.
- Dispatching a jitted program on an in-flight upload blocks the calling
  host thread until the operand lands; doing that from a worker thread
  keeps the main thread free.

`Uploader` streams a list of images to the device in bounded chunks from a
background thread, keeping at most `depth` chunks in flight (so the FIFO
queue never grows beyond ~2 chunk-times), and exposes:

- per-image device handles (`image(i)` blocks until image i has landed);
- `yield_lane()`: a context manager that pauses chunk submission so an
  urgent small upload (bundle-adjustment problem tensors, kernel scalars)
  sees at most the in-flight chunks ahead of it;
- `subset(indices)`: drop images (after registration subsetting) without
  cancelling the stream.

Everything is a plain numpy/JAX structure — no custom runtime state leaks
into the jitted programs, so this composes with any compute path.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK_BYTES = 3_000_000  # ~75 ms per chunk at the measured ~40 MB/s


@jax.jit
def _first_elem(x):
    return x.ravel()[0]


def _sync(dev_arr):
    """Wait until `dev_arr`'s definition (upload) completes.

    `block_until_ready` is unreliable through the axon tunnel (returns
    early); fetching one scalar is an authoritative fence. The fence rides
    the download direction of the duplex link, so it never stalls uploads.
    """
    np.asarray(_first_elem(dev_arr))


class _ImageSlot:
    __slots__ = ("parts", "event", "shape", "dtype", "_joined")

    def __init__(self, shape, dtype):
        self.parts = []
        self.event = threading.Event()
        self.shape = shape
        self.dtype = dtype
        self._joined = None

    def device_array(self):
        """The full image as one device array (blocks until uploaded)."""
        self.event.wait()
        if self._joined is None:
            self._joined = (self.parts[0] if len(self.parts) == 1
                            else jnp.concatenate(self.parts, axis=0))
        return self._joined


class _LaneCtx:
    """Lane context: pauses chunk submission while held; on the FIRST
    release flips the uploader into full-throttle mode (big chunks, deep
    pipeline) — the preemption it existed for has happened."""

    def __init__(self, up):
        self._up = up

    def __enter__(self):
        self._up._lane.acquire()
        return self

    def __exit__(self, *a):
        self._up._lane.release()
        self._up._lane_done.set()
        return False


class Uploader:
    """Background chunked upload of a list of HxW[xC] numpy images.

    Two pacing phases, tuned to the measured tunnel behavior (bulk
    throughput rises with RPC size and pipeline depth; preemption latency
    falls with both): until the yield lane is first used, conservative
    small chunks at shallow depth keep the lane responsive (~0.2 s) for
    the urgent small uploads that gate registration; after the first lane
    release, big chunks at full depth maximize bulk throughput — nothing
    latency-critical queues behind the stream anymore (camera math is
    slower-but-parallel, and the FINAL pass consumes images in upload
    order).
    """

    def __init__(self, imgs, chunk_bytes=_CHUNK_BYTES, depth=2,
                 fast_chunk_bytes=16_000_000, fast_depth=6):
        self.chunk_bytes = int(chunk_bytes)
        self.depth = int(depth)
        self.fast_chunk_bytes = int(fast_chunk_bytes)
        self.fast_depth = int(fast_depth)
        self._lane = threading.Lock()   # held by yield_lane() to pause us
        self._lane_done = threading.Event()
        self._slots = [
            _ImageSlot(np.asarray(im).shape, np.asarray(im).dtype)
            for im in imgs]
        self._imgs = [np.asarray(im) for im in imgs]
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- producer ----------------------------------------------------------

    def _run(self):
        import time

        from . import profiling as prof

        t0 = time.perf_counter()
        try:
            inflight = []   # device arrays not yet fenced

            def throttle(depth):
                while len(inflight) >= depth:
                    _sync(inflight.pop(0))

            for slot, img in zip(self._slots, self._imgs):
                r0 = 0
                while r0 < img.shape[0]:
                    fast = self._lane_done.is_set()
                    cb = self.fast_chunk_bytes if fast else self.chunk_bytes
                    rows_per = max(1, cb // max(img[0:1].nbytes, 1))
                    throttle(self.fast_depth if fast else self.depth)
                    with self._lane:   # yield point for urgent uploads
                        part = jax.device_put(
                            np.ascontiguousarray(img[r0:r0 + rows_per]))
                    slot.parts.append(part)
                    inflight.append(part)
                    r0 += rows_per
                slot.event.set()
            while inflight:
                _sync(inflight.pop(0))
        except Exception as e:    # surface in consumers, don't die silently
            self._error = e
            for slot in self._slots:
                slot.event.set()
        finally:
            self._imgs = None     # release host copies
            prof.record("transfer/originals_stream",
                        time.perf_counter() - t0)

    # -- consumers ---------------------------------------------------------

    def image(self, i):
        """Device uint8/float array of image i (blocks until it landed)."""
        slot = self._slots[i]
        slot.event.wait()
        if self._error is not None:
            raise self._error
        return slot.device_array()

    def __len__(self):
        return len(self._slots)

    @property
    def channels(self):
        """Channel count of the stitched output (1 for all-gray inputs,
        matching `pipeline.stack_images` widening rules)."""
        return 3 if any(len(s.shape) == 3 and s.shape[2] == 3
                        for s in self._slots) else 1

    def subset(self, indices):
        """Keep only `indices` (registration subsetting)."""
        self._slots = [self._slots[i] for i in indices]

    def yield_lane(self):
        """Context manager pausing chunk submission; urgent uploads issued
        inside wait behind at most `depth` in-flight chunks. The first
        release flips the stream into full-throttle mode."""
        return _LaneCtx(self)

    def join(self):
        self._thread.join()
        if self._error is not None:
            raise self._error
