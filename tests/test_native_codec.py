"""Native (C++) image decode path: parity with PIL + graceful fallback.

convnets_tpu/native compiles imgcodec.cpp (libpng/libjpeg + fused bilinear
resize) on first use and binds it via ctypes; ImageFolderDataset._decode
prefers it with PIL as the fallback. The contract tested here: decode is
bit-identical to PIL, resize within ±1 uint8 level of PIL's BILINEAR, and
every failure path degrades to PIL instead of erroring.
"""

import os

import numpy as np
import pytest
from PIL import Image

from convnets_tpu import native
from convnets_tpu.data.datasets import ImageFolderDataset


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    rng = np.random.RandomState(7)
    p = tmp_path_factory.mktemp("imgs") / "t.png"
    Image.fromarray(rng.randint(0, 255, (24, 20, 3), np.uint8)).save(p)
    return str(p)


@pytest.fixture(scope="module")
def jpg_path(tmp_path_factory):
    rng = np.random.RandomState(8)
    p = tmp_path_factory.mktemp("imgs") / "t.jpg"
    Image.fromarray(rng.randint(0, 255, (24, 20, 3), np.uint8)).save(
        p, quality=95)
    return str(p)


def test_native_builds_on_this_host():
    assert native.available(), "g++ -lpng -ljpeg build failed"


def test_png_decode_bit_identical(png_path):
    a = native.decode_image(png_path)
    b = np.asarray(Image.open(png_path).convert("RGB"), np.uint8)
    assert a is not None
    np.testing.assert_array_equal(a, b)


def test_jpeg_decode_close_to_pil(jpg_path):
    # JPEG decoders may legally differ in IDCT rounding; PIL uses the same
    # libjpeg here so the outputs should be (near-)identical
    a = native.decode_image(jpg_path)
    b = np.asarray(Image.open(jpg_path).convert("RGB"), np.uint8)
    assert a is not None
    assert a.shape == b.shape
    assert np.mean(np.abs(a.astype(int) - b.astype(int))) <= 1.0


def test_resize_matches_pil_bilinear(png_path):
    a = native.decode_image(png_path, (64, 48))
    b = np.asarray(
        Image.open(png_path).convert("RGB").resize((48, 64), Image.BILINEAR),
        np.uint8)
    assert a.shape == (64, 48, 3)
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_image_size(png_path):
    assert native.image_size(png_path) == (24, 20)


def test_grayscale_and_palette_pngs(tmp_path):
    rng = np.random.RandomState(9)
    gray = tmp_path / "g.png"
    Image.fromarray(rng.randint(0, 255, (16, 16), np.uint8), "L").save(gray)
    a = native.decode_image(str(gray))
    b = np.asarray(Image.open(gray).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(a, b)

    pal = tmp_path / "p.png"
    Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE).save(pal)
    a = native.decode_image(str(pal))
    b = np.asarray(Image.open(pal).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(a, b)


def test_missing_file_returns_none():
    assert native.decode_image("/nonexistent/x.png") is None
    assert native.image_size("/nonexistent/x.png") is None


def test_imagefolder_uses_native_and_matches_pil(tmp_path, monkeypatch):
    rng = np.random.RandomState(3)
    root = tmp_path / "set"
    for c in ("a", "b"):
        d = root / c
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (12, 12, 3), np.uint8)).save(
                d / f"{i}.png")

    ds_native = ImageFolderDataset(str(root))
    x_native, y = ds_native.load_raw(np.arange(len(ds_native)))

    monkeypatch.setenv("CONVNETS_TPU_NATIVE_DECODE", "0")
    assert not native.available()
    ds_pil = ImageFolderDataset(str(root))
    x_pil, y2 = ds_pil.load_raw(np.arange(len(ds_pil)))
    np.testing.assert_array_equal(x_native, x_pil)
    np.testing.assert_array_equal(y, y2)


def test_env_gate_restores(monkeypatch):
    monkeypatch.setenv("CONVNETS_TPU_NATIVE_DECODE", "0")
    assert not native.available()
    monkeypatch.delenv("CONVNETS_TPU_NATIVE_DECODE")
    assert native.available()


def test_downscale_matches_pil_antialiased(tmp_path):
    """Downscale must use PIL's scaled-support (antialiased) BILINEAR, not
    a fixed 2-tap bilinear — a 2-tap shrink drops most source pixels."""
    rng = np.random.RandomState(11)
    big = tmp_path / "big.png"
    Image.fromarray(rng.randint(0, 255, (128, 96, 3), np.uint8)).save(big)
    a = native.decode_image(str(big), (32, 24))
    b = np.asarray(
        Image.open(big).convert("RGB").resize((24, 32), Image.BILINEAR),
        np.uint8)
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 2 and d.mean() <= 0.5, (d.max(), d.mean())


def test_image_size_is_header_only_fast(tmp_path):
    """The size probe must not pay a full decode (it runs before every
    native-size decode)."""
    import time

    rng = np.random.RandomState(12)
    big = tmp_path / "big.png"
    Image.fromarray(rng.randint(0, 255, (1024, 1024, 3), np.uint8)).save(big)
    t0 = time.perf_counter()
    for _ in range(20):
        assert native.image_size(str(big)) == (1024, 1024)
    probe = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    native.decode_image(str(big))
    full = time.perf_counter() - t0
    assert probe < full / 5, (probe, full)
