"""Data pipeline tests: .bin format round-trip (byte-compatible with the
reference), metadata, DIV2K sample generation, dataset validation."""

import struct

import numpy as np
import pytest

from bicubic_interpolation_model_tpu.data import binfmt, div2k, validate
from bicubic_interpolation_model_tpu.ops.downsample import downsample
from bicubic_interpolation_model_tpu.utils import imageio

from conftest import random_image


def test_binfmt_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((7, 5, 16)).astype(np.float32)
    p = tmp_path / "t.bin"
    binfmt.write_tensor(p, arr)
    # byte-level: 12-byte LE header then raw f32
    raw = p.read_bytes()
    assert struct.unpack("<III", raw[:12]) == (7, 5, 16)
    assert len(raw) == 12 + 7 * 5 * 16 * 4
    got = binfmt.read_tensor(p)
    np.testing.assert_array_equal(got, arr)


def test_metadata_update_atomic(tmp_path):
    mp = tmp_path / "metadata.json"
    binfmt.update_metadata(mp, "0001", 10, 12, 40, 48)
    binfmt.update_metadata(mp, "0002", 5, 6, 20, 24)
    meta = binfmt.read_metadata(mp)
    assert meta["0001"]["H_sr"] == 40
    assert meta["0002"]["channels"] == {"X": 4, "offset": 2, "Y": 16}
    assert not mp.with_suffix(".json.tmp").exists()


def test_downsample_shapes_and_constant(rng):
    img = np.full((32, 24, 4), 99, np.uint8)
    out = np.asarray(downsample(img, 4.0, "cubic"))
    assert out.shape == (8, 6, 4)
    np.testing.assert_array_equal(out, 99)
    for m in ("box", "triangle", "lanczos3"):
        assert np.asarray(downsample(img, 4.0, m)).shape == (8, 6, 4)


def test_downsample_box_inverts_pixel_replication(rng):
    """Box-downsampling an sxs pixel-replicated image recovers it exactly
    (each box window covers exactly one source pixel's replicas)."""
    img = random_image(rng, 9, 7)
    up = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)
    back = np.asarray(downsample(up, 4.0, "box"))
    np.testing.assert_array_equal(back, img)


def test_downsample_linear_ramp_exact():
    """Center-aligned antialiased downsample of a linear ramp evaluates the
    ramp at (X+0.5)*f - 0.5 exactly (kernels reproduce linear functions)."""
    w_in, f = 64, 4.0
    ramp = np.broadcast_to(np.arange(w_in, dtype=np.float32)[None, :, None],
                           (16, w_in, 1))
    for method in ("triangle", "cubic", "lanczos3"):
        out = np.asarray(downsample(ramp, f, method))
        want = (np.arange(w_in // 4) + 0.5) * f - 0.5
        # lanczos3 support spans 3*f=12 source px; skip outputs whose window
        # touches the clamped border
        np.testing.assert_allclose(out[2, 4:-4, 0], want[4:-4], atol=1e-4,
                                   err_msg=method)


def test_generate_sample_and_validate(tmp_path, rng):
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    for i in range(2):
        img = random_image(rng, 26, 22)  # will align-crop to 24x20
        imageio.save_png(hr_dir / f"{i:04d}.png", img)

    records = div2k.process_images(hr_dir, tmp_path / "data", scale=4,
                                   split="train", log=lambda *_: None)
    assert len(records) == 2
    assert records[0].h_sr == 24 and records[0].w_sr == 20
    assert records[0].h_lr == 6 and records[0].w_lr == 5

    reports = validate.validate_dataset(tmp_path / "data" / "train",
                                        log=lambda *_: None)
    assert all(r.ok for r in reports), [r.errors for r in reports]


def test_generate_sample_adaptive(tmp_path, rng):
    img = random_image(rng, 16, 16)
    x, off, w = div2k.generate_sample(img, scale=4, adaptive=True)
    assert w.shape == (16, 16, 16)
    s = w.sum(-1)
    np.testing.assert_allclose(s[s != 0], 1.0, atol=1e-4)


def test_reference_bin_interchange(tmp_path, reference_root):
    """Our reader must parse a file written exactly like the reference writes
    it (Buffer.concat([12-byte header, Float32Array bytes]))."""
    h, w, c = 3, 4, 2
    data = np.arange(h * w * c, dtype="<f4")
    raw = struct.pack("<III", h, w, c) + data.tobytes()
    p = tmp_path / "ref_style.bin"
    p.write_bytes(raw)
    got = binfmt.read_tensor(p)
    assert got.shape == (3, 4, 2)
    np.testing.assert_array_equal(got.reshape(-1), data)
