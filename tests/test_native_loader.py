"""Native C++ decode-pool loader tests (data/native/loader.cc via ctypes)."""

import io

import numpy as np
import pytest
from PIL import Image

from gvcnn_tf_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


def _encode(arr, fmt):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format=fmt, quality=95)
    return b.getvalue()


def test_decode_jpeg_and_png_batch():
    rng = np.random.RandomState(0)
    arrs = [rng.randint(0, 255, (50, 40, 3), np.uint8) for _ in range(6)]
    blobs = [_encode(a, "JPEG" if i % 2 else "PNG") for i, a in enumerate(arrs)]
    dec = native_loader.NativeDecoder(4)
    out = dec.decode(blobs, 32, 32)
    assert out.shape == (6, 32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_decode_uint8_wire_format():
    """dtype=uint8 decode: raw [0,255] bytes whose device-side normalize
    agrees with the float path to the post-resize rounding (<= 1/255 in
    normalized units, i.e. <= 0.5 of one 8-bit level)."""
    rng = np.random.RandomState(1)
    arrs = [rng.randint(0, 255, (48, 48, 3), np.uint8) for _ in range(4)]
    blobs = [_encode(a, "PNG") for a in arrs]
    dec = native_loader.NativeDecoder(2)
    raw = dec.decode(blobs, 32, 32, dtype=np.uint8)
    ref = dec.decode(blobs, 32, 32)                 # float path
    assert raw.shape == (4, 32, 32, 3) and raw.dtype == np.uint8
    renorm = raw.astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(renorm, ref, atol=1.01 / 255.0)
    # identity-resize of a PNG (lossless) must be the source bytes exactly
    one = dec.decode([_encode(arrs[0], "PNG")], 48, 48, dtype=np.uint8)
    np.testing.assert_array_equal(one[0], arrs[0])


def test_native_dataset_raw_uint8(tmp_path):
    rng = np.random.RandomState(2)
    for cls in ("a", "b"):
        d = tmp_path / cls / "s0"
        d.mkdir(parents=True)
        for v in range(2):
            Image.fromarray(
                rng.randint(0, 255, (16, 16, 3), np.uint8)
            ).save(d / f"v{v}.png")
    it = native_loader.native_dataset(
        str(tmp_path), num_views=2, height=16, width=16, batch_size=2,
        train=False, num_epochs=1, raw_uint8=True)
    b = next(iter(it))
    assert b["views"].dtype == np.uint8
    assert b["views"].shape == (2, 2, 16, 16, 3)


def test_bilinear_matches_pil_on_smooth_content():
    h = w = 64
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack([x * 255 / w, y * 255 / h, (x + y) * 255 / (h + w)],
                   -1).astype(np.uint8)
    dec = native_loader.NativeDecoder(2)
    out = dec.decode([_encode(arr, "PNG")], 32, 32)[0]
    ref = (np.asarray(Image.fromarray(arr).resize((32, 32), Image.BILINEAR),
                      np.float32) / 255 * 2 - 1)
    assert np.abs(out - ref).max() < 0.02


def test_horizontal_flip_exact():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
    blob = _encode(arr, "PNG")
    dec = native_loader.NativeDecoder(2)
    plain = dec.decode([blob], 32, 32)[0]
    flipped = dec.decode([blob], 32, 32, flips=np.array([1], np.uint8))[0]
    np.testing.assert_array_equal(flipped, plain[:, ::-1])


def test_corrupt_blob_raises():
    dec = native_loader.NativeDecoder(2)
    with pytest.raises(ValueError, match="failed to decode"):
        dec.decode([b"not an image"], 16, 16)


def test_native_dataset_stream(tmp_path):
    rng = np.random.RandomState(0)
    V = 3
    for cls in ["a", "b"]:
        for s in range(3):
            d = tmp_path / cls / f"{cls}{s}"
            d.mkdir(parents=True)
            for v in range(V):
                Image.fromarray(
                    rng.randint(0, 255, (40, 40, 3), np.uint8)
                ).save(d / f"v{v}.png")
    batches = list(native_loader.native_dataset(
        str(tmp_path), num_views=V, height=24, width=24, batch_size=2,
        train=False, num_epochs=1,
    ))
    assert len(batches) == 3
    b = batches[0]
    assert b["views"].shape == (2, V, 24, 24, 3)
    assert b["label"].shape == (2,)
    assert set(np.concatenate([x["label"] for x in batches])) == {0, 1}


def test_pipeline_auto_dispatches_native(tmp_path):
    from gvcnn_tf_tpu.configs import DataConfig
    from gvcnn_tf_tpu.data import make_dataset

    rng = np.random.RandomState(0)
    for cls in ["a", "b"]:
        d = tmp_path / cls / f"{cls}0"
        d.mkdir(parents=True)
        for v in range(2):
            Image.fromarray(
                rng.randint(0, 255, (20, 20, 3), np.uint8)
            ).save(d / f"v{v}.png")
    cfg = DataConfig(dataset_dir=str(tmp_path), num_views=2, height=16,
                     width=16, batch_size=2, num_classes=2)
    it = make_dataset(cfg, train=False, num_epochs=1)
    batch = next(iter(it))
    assert batch["views"].shape == (2, 2, 16, 16, 3)
