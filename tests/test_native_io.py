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
