"""Native C++ IO runtime (libbimio.so): build, codec round-trips, parity with
PIL on the reference's real PNGs, tensor-file interchange."""

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.runtime import native

from conftest import random_image

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_png_roundtrip(tmp_path, rng):
    img = random_image(rng, 23, 17)
    p = tmp_path / "x.png"
    assert native.encode_png(p, img)
    back = native.decode_png(p)
    np.testing.assert_array_equal(back, img)


def test_decode_matches_pil_on_reference_images(reference_root):
    from PIL import Image
    for rel in ["cp_image/lr_images/0020_downsample.png",
                "cp_image/rebuild_hr_images/0020/nearest.png"]:
        p = reference_root / rel
        ours = native.decode_png(p)
        with Image.open(p) as im:
            want = np.asarray(im.convert("RGBA"))
        if ours is None:
            pytest.skip(f"native decoder declined {rel} (falls back to PIL)")
        np.testing.assert_array_equal(ours, want, err_msg=rel)


def test_tensor_bin_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((5, 7, 16)).astype(np.float32)
    p = tmp_path / "t.bin"
    assert native.write_tensor_bin(p, arr)
    back = native.read_tensor_bin(p)
    np.testing.assert_array_equal(back, arr)


def test_tensor_bin_matches_python_writer(tmp_path, rng):
    from bicubic_interpolation_model_tpu.data import binfmt
    arr = rng.standard_normal((4, 3, 2)).astype(np.float32)
    p1 = tmp_path / "native.bin"
    p2 = tmp_path / "python.bin"
    assert native.write_tensor_bin(p1, arr)
    import os
    os.environ["BIM_TPU_NO_NATIVE"] = "1"
    try:
        binfmt.write_tensor(p2, arr)
    finally:
        del os.environ["BIM_TPU_NO_NATIVE"]
    assert p1.read_bytes() == p2.read_bytes()


def _save_jpeg(tmp_path, arr, name="x.jpg", **kw):
    from PIL import Image
    p = tmp_path / name
    mode = "L" if arr.ndim == 2 or arr.shape[-1] == 1 else "RGB"
    Image.fromarray(arr.squeeze(), mode).save(p, **kw)
    return p


@pytest.mark.parametrize("subsampling,quality,size", [
    (0, 95, (67, 129)),   # 4:4:4
    (1, 85, (128, 256)),  # 4:2:2
    (2, 75, (333, 511)),  # 4:2:0, odd dims exercise edge-block replication
])
def test_jpeg_decode_matches_pil(tmp_path, rng, subsampling, quality, size):
    """Baseline-JPEG parity vs PIL/libjpeg. T.81 doesn't pin the IDCT
    bit-exactly, so allow a few LSB; measured max is 4 across subsamplings."""
    from PIL import Image
    if not hasattr(native, "decode_jpeg"):
        pytest.skip("old native build without JPEG")
    arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
    p = _save_jpeg(tmp_path, arr, quality=quality, subsampling=subsampling)
    ours = native.decode_jpeg(p)
    assert ours is not None
    with Image.open(p) as im:
        want = np.asarray(im.convert("RGBA"))
    assert ours.shape == want.shape
    d = np.abs(ours.astype(int) - want.astype(int))
    assert d.max() <= 6 and d.mean() < 1.0


def test_jpeg_decode_grayscale_and_restart(tmp_path, rng):
    from PIL import Image
    arr = rng.integers(0, 256, (100, 200), dtype=np.uint8)
    p = _save_jpeg(tmp_path, arr, quality=90)
    ours = native.decode_jpeg(p)
    want = np.asarray(Image.open(p).convert("RGBA"))
    assert np.abs(ours.astype(int) - want.astype(int)).max() <= 2
    # restart markers (DRI segments); skip if Pillow too old to emit them
    rgb = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    try:
        p2 = _save_jpeg(tmp_path, rgb, "r.jpg", quality=85,
                        restart_marker_rows=1)
    except (TypeError, OSError):
        pytest.skip("Pillow lacks restart_marker_rows")
    ours = native.decode_jpeg(p2)
    want = np.asarray(Image.open(p2).convert("RGBA"))
    assert ours is not None
    assert np.abs(ours.astype(int) - want.astype(int)).max() <= 6


def test_jpeg_progressive_falls_back_to_pil(tmp_path, rng):
    """Progressive (SOF2) is out of scope for the native decoder: it must
    decline cleanly and load_rgba must deliver via PIL."""
    from bicubic_interpolation_model_tpu.utils.imageio import load_rgba
    arr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    p = _save_jpeg(tmp_path, arr, "p.jpg", progressive=True, quality=90)
    assert native.decode_jpeg(p) is None
    assert load_rgba(p).shape == (64, 96, 4)


def test_jpeg_encode_roundtrip(tmp_path, rng):
    """Native baseline-JPEG ENCODER (sharp's write side): decodable by both
    libjpeg (via PIL — independent implementation) and our own decoder,
    with the expected quality/size trade."""
    from PIL import Image
    if not hasattr(native, "encode_jpeg"):
        pytest.skip("old native build without JPEG encode")
    # smooth-ish content: random noise is JPEG's worst case, gradients are
    # representative of the DIV2K workflow
    yy, xx = np.mgrid[0:65, 0:117]
    base = (yy * 2 + xx).astype(np.uint8)
    img = np.stack([base, base[::-1], base ^ 0x55,
                    np.full_like(base, 255)], -1)
    sizes = {}
    for q in (95, 50):
        p = tmp_path / f"q{q}.jpg"
        assert native.encode_jpeg(p, img, quality=q)
        sizes[q] = p.stat().st_size
        with Image.open(p) as im:
            assert im.size == (117, 65)
            back = np.asarray(im.convert("RGBA")).astype(int)
        d = np.abs(back[..., :3] - img[..., :3].astype(int))
        psnr = 10 * np.log10(255 ** 2 / max((d.astype(float) ** 2).mean(),
                                            1e-9))
        assert psnr > (38 if q == 95 else 30), f"q={q}: {psnr:.1f} dB"
        ours = native.decode_jpeg(p)
        assert np.abs(ours.astype(int) - back).max() <= 4
    assert sizes[50] < sizes[95]
    # grayscale single-component scan
    pg = tmp_path / "g.jpg"
    assert native.encode_jpeg(pg, np.repeat(base[..., None], 4, -1),
                              quality=90, gray=True)
    with Image.open(pg) as im:
        assert im.mode == "L"
        back = np.asarray(im).astype(int)
    assert np.abs(back - base.astype(int)).mean() < 3


def test_save_by_extension(tmp_path, rng):
    """imageio.save_image dispatches on extension like sharp's writer."""
    from bicubic_interpolation_model_tpu.utils.imageio import (
        load_rgba,
        save_image,
    )
    img = random_image(rng, 33, 47)
    save_image(tmp_path / "x.png", img)
    np.testing.assert_array_equal(load_rgba(tmp_path / "x.png"), img)
    save_image(tmp_path / "x.jpg", img)
    back = load_rgba(tmp_path / "x.jpg")
    assert back.shape == img.shape  # lossy, shape + rough content only
    assert np.abs(back[..., :3].astype(int)
                  - img[..., :3].astype(int)).mean() < 20


def test_jpeg_hostile_inputs_rejected(tmp_path):
    """Truncated/garbage streams must fail cleanly, never crash."""
    cases = [
        b"",                                  # empty
        b"\xff\xd8",                          # bare SOI
        b"\xff\xd8\xff\xc0\x00\x04\x08",      # truncated SOF0
        bytes(range(256)) * 8,                # garbage
        b"\xff\xd8\xff\xdb\x00\x43\x00" + b"\x01" * 64 + b"\xff\xd9",
    ]
    for i, blob in enumerate(cases):
        p = tmp_path / f"evil{i}.jpg"
        p.write_bytes(blob)
        assert native.decode_jpeg(p) is None, f"case {i}"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    import struct, zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def test_hostile_png_dimensions_rejected(tmp_path):
    """Crafted IHDR dims whose size math would wrap size_t must be rejected
    cleanly (no crash, no huge allocation) — ADVICE r1 medium."""
    import struct, zlib
    sig = bytes([137, 80, 78, 71, 13, 10, 26, 10])
    for w, h in [(1 << 30, 1 << 31), (0xFFFFFFFF, 0xFFFFFFFF), (1 << 21, 2)]:
        ihdr = struct.pack(">IIBBBBB", w & 0xFFFFFFFF, h & 0xFFFFFFFF,
                           8, 6, 0, 0, 0)
        idat = zlib.compress(b"\x00" * 16)
        png = sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) \
            + _chunk(b"IEND", b"")
        p = tmp_path / "evil.png"
        p.write_bytes(png)
        assert native.decode_png(p) is None


def test_corrupt_tensor_bin_rejected(tmp_path):
    """A .bin whose header disagrees with the file size must not drive the
    allocation (ADVICE r1 low)."""
    import struct
    p = tmp_path / "evil.bin"
    # near-2^64-element request
    p.write_bytes(struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF)
                  + b"\x00" * 64)
    assert native.read_tensor_bin(p) is None
    # header claims more floats than the file holds
    p.write_bytes(struct.pack("<III", 4, 4, 4) + b"\x00" * 8)
    assert native.read_tensor_bin(p) is None
    # truncated header
    p.write_bytes(b"\x01\x02")
    assert native.read_tensor_bin(p) is None
