"""ctypes bindings + dataset for the native C++ multi-view loader.

The C++ side (data/native/loader.cc) does threaded JPEG/PNG decode,
bilinear resize, and [-1,1] normalization straight into a caller-owned
float32 buffer.  Python's job is only IO and batching; a one-deep
background prefetch thread overlaps host decode with device compute.

The .so is built lazily with `make` on first use and the loader degrades
gracefully: `available()` is False if the toolchain or libjpeg/libpng are
missing, and callers fall back to the tf.data/PIL paths.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgvloader.so")

_lib = None
_lib_err: Optional[str] = None


def _build_and_load():
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return
    try:
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "loader.cc"))
        ):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, text=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.gvl_create.restype = ctypes.c_void_p
        lib.gvl_create.argtypes = [ctypes.c_int]
        lib.gvl_destroy.argtypes = [ctypes.c_void_p]
        lib.gvl_decode_batch.restype = ctypes.c_int
        lib.gvl_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gvl_decode_batch_u8.restype = ctypes.c_int
        lib.gvl_decode_batch_u8.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception as e:  # missing toolchain/libs -> fallback path
        _lib_err = str(e)


def available() -> bool:
    _build_and_load()
    return _lib is not None


class NativeDecoder:
    """Threaded decode of a list of encoded blobs -> (N, H, W, 3) float32."""

    def __init__(self, num_threads: int = 0):
        _build_and_load()
        if _lib is None:
            raise RuntimeError(f"native loader unavailable: {_lib_err}")
        self._h = _lib.gvl_create(num_threads)

    def __del__(self):
        if getattr(self, "_h", None) and _lib is not None:
            _lib.gvl_destroy(self._h)
            self._h = None

    def decode(
        self,
        blobs: Sequence[bytes],
        height: int,
        width: int,
        flips: Optional[np.ndarray] = None,
        out: Optional[np.ndarray] = None,
        dtype=np.float32,
    ) -> np.ndarray:
        """`dtype=np.float32` -> normalized [-1, 1]; `dtype=np.uint8` ->
        raw [0, 255] bytes (post-resize round) for transfer_dtype='uint8'
        runs where the device normalizes (utils/images.py)."""
        n = len(blobs)
        dtype = np.dtype(dtype)
        if out is None:
            out = np.empty((n, height, width, 3), dtype)
        assert out.shape == (n, height, width, 3) and out.dtype == dtype
        arr_blobs = (ctypes.c_char_p * n)(*blobs)
        arr_sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        if flips is None:
            flips_ptr = None
        else:
            flips = np.ascontiguousarray(flips, np.uint8)
            flips_ptr = flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if dtype == np.uint8:
            failures = _lib.gvl_decode_batch_u8(
                self._h, arr_blobs, arr_sizes, n, height, width, flips_ptr,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
        elif dtype == np.float32:
            failures = _lib.gvl_decode_batch(
                self._h, arr_blobs, arr_sizes, n, height, width, flips_ptr,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        else:
            raise ValueError(f"unsupported decode dtype {dtype}")
        if failures:
            raise ValueError(f"{failures}/{n} images failed to decode")
        return out


def native_dataset(
    image_root: str,
    *,
    num_views: int,
    height: int,
    width: int,
    batch_size: int,
    train: bool = True,
    num_epochs: Optional[int] = None,
    seed: int = 0,
    num_threads: int = 0,
    prefetch: int = 2,
    shard_index: int = 0,
    num_shards: int = 1,
    raw_uint8: bool = False,
) -> Iterator[dict]:
    """Stream (B, V, H, W, 3) batches straight from a rendered-view tree.

    Bypasses tf.data entirely: Python reads files, the C++ pool decodes
    them, and a background thread keeps `prefetch` batches ready.  Same
    layout rules as the TFRecord builder (data/tfrecord.discover_shapes).
    """
    from gvcnn_tf_tpu.data.tfrecord import discover_shapes

    shapes, _ = discover_shapes(image_root)
    shapes = [(sid, lbl, v[:num_views]) for sid, lbl, v in shapes
              if len(v) >= num_views]
    if num_shards > 1:  # multi-host: disjoint shape subset per process
        shapes = shapes[shard_index::num_shards]
    if not shapes:
        raise ValueError(f"no shapes with >= {num_views} views in {image_root}")

    decoder = NativeDecoder(num_threads)
    rng = np.random.RandomState(seed)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        epoch = 0
        try:
            while not stop.is_set() and (num_epochs is None or epoch < num_epochs):
                order = rng.permutation(len(shapes)) if train else np.arange(len(shapes))
                # Train drops the ragged tail (stream repeats); eval yields
                # the short tail so the full split is scored.
                last = len(shapes) - batch_size + 1 if train else len(shapes)
                for s in range(0, last, batch_size):
                    if stop.is_set():
                        return
                    idx = order[s:s + batch_size]
                    n = len(idx)
                    blobs: List[bytes] = []
                    labels = np.empty(n, np.int32)
                    for bi, si in enumerate(idx):
                        _, lbl, views = shapes[si]
                        labels[bi] = lbl
                        for v in views:
                            with open(v, "rb") as f:
                                blobs.append(f.read())
                    flips = (
                        rng.randint(0, 2, len(blobs)).astype(np.uint8)
                        if train else None
                    )
                    flat = decoder.decode(
                        blobs, height, width, flips,
                        dtype=np.uint8 if raw_uint8 else np.float32)
                    q.put({
                        "views": flat.reshape(n, num_views, height, width, 3),
                        "label": labels,
                    })
                epoch += 1
        except BaseException as e:  # surface pipeline crashes to the consumer
            q.put(e)                # (a swallowed error looks like clean EOF)
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # Drain so the producer can exit its q.put.
        while not q.empty():
            q.get_nowait()
