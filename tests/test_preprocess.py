"""Greyscale conversion / image validation tests.

Ported from /root/reference/ocrs/src/preprocess.rs:274-594.
"""

import numpy as np
import pytest

from ocrs_ray.preprocess import (
    BLACK_VALUE,
    ImageSourceError,
    image_from_bytes,
    prepare_image,
)

ITU = [0.299, 0.587, 0.114]


def expected_grey(r, g, b):
    return BLACK_VALUE + r * ITU[0] + g * ITU[1] + b * ITU[2]


def assert_close(actual, expected):
    assert abs(actual - expected) < 1e-5, f"expected {expected}, got {actual}"


def test_image_from_bytes():
    cases = [
        (100, 10, 10, None),
        (50, 10, 10, ImageSourceError.INVALID_DATA_LENGTH),
        (8 * 8 * 2, 8, 8, ImageSourceError.UNSUPPORTED_CHANNEL_COUNT),
        (0, 0, 10, ImageSourceError.UNSUPPORTED_CHANNEL_COUNT),
    ]
    for length, width, height, err in cases:
        data = bytes(range(length % 256)) if length <= 256 else bytes(length)
        data = bytes([i % 256 for i in range(length)])
        if err is None:
            img = image_from_bytes(data, width, height)
            assert img.shape == (height, width, 1)
        else:
            with pytest.raises(ImageSourceError, match=err.replace("`", "\\`").replace("*", "\\*")):
                image_from_bytes(data, width, height)


def test_prepare_image_validation():
    with pytest.raises(ImageSourceError):
        prepare_image(np.zeros((5, 5, 1), dtype=np.uint8), order="chw")
    with pytest.raises(ImageSourceError):
        prepare_image(np.zeros((0, 5, 5), dtype=np.uint8), order="chw")
    # 1-channel CHW is fine.
    out = prepare_image(np.zeros((1, 5, 5), dtype=np.uint8), order="chw")
    assert out.shape == (1, 5, 5)


@pytest.mark.parametrize(
    "shape,order", [((2, 2, 1), "hwc"), ((1, 2, 2), "chw")]
)
def test_prepare_image_greyscale_u8(shape, order):
    data = np.array([0, 128, 255, 64], dtype=np.uint8).reshape(shape)
    result = prepare_image(data, order=order)
    assert result.shape == (1, 2, 2)
    assert_close(result[0, 0, 0], BLACK_VALUE + 0.0)
    assert_close(result[0, 0, 1], BLACK_VALUE + 128.0 / 255.0)
    assert_close(result[0, 1, 0], BLACK_VALUE + 1.0)
    assert_close(result[0, 1, 1], BLACK_VALUE + 64.0 / 255.0)


@pytest.mark.parametrize(
    "shape,order", [((2, 2, 1), "hwc"), ((1, 2, 2), "chw")]
)
def test_prepare_image_greyscale_f32(shape, order):
    data = np.array([0.0, 0.5, 1.0, 0.25], dtype=np.float32).reshape(shape)
    result = prepare_image(data, order=order)
    assert result.shape == (1, 2, 2)
    assert_close(result[0, 0, 0], BLACK_VALUE + 0.0)
    assert_close(result[0, 0, 1], BLACK_VALUE + 0.5)
    assert_close(result[0, 1, 0], BLACK_VALUE + 1.0)
    assert_close(result[0, 1, 1], BLACK_VALUE + 0.25)


@pytest.mark.parametrize(
    "data,shape,order,rgb",
    [
        ([100, 150, 200], (1, 1, 3), "hwc", (100, 150, 200)),
        ([100, 150, 200], (3, 1, 1), "chw", (100, 150, 200)),
        ([50, 100, 150, 255], (1, 1, 4), "hwc", (50, 100, 150)),
        ([50, 100, 150, 255], (4, 1, 1), "chw", (50, 100, 150)),
    ],
)
def test_prepare_image_rgb_rgba_u8(data, shape, order, rgb):
    tensor = np.array(data, dtype=np.uint8).reshape(shape)
    result = prepare_image(tensor, order=order)
    assert result.shape == (1, 1, 1)
    r, g, b = rgb
    assert_close(result[0, 0, 0], expected_grey(r / 255.0, g / 255.0, b / 255.0))


@pytest.mark.parametrize("shape,order", [((1, 1, 3), "hwc"), ((3, 1, 1), "chw")])
def test_prepare_image_rgb_f32(shape, order):
    r, g, b = 0.4, 0.6, 0.8
    tensor = np.array([r, g, b], dtype=np.float32).reshape(shape)
    result = prepare_image(tensor, order=order)
    assert result.shape == (1, 1, 1)
    assert_close(result[0, 0, 0], expected_grey(r, g, b))


def test_prepare_image_multi_pixel_rgb():
    hwc = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [128, 128, 128]]], dtype=np.uint8
    )
    chw = np.moveaxis(hwc, -1, 0)
    for tensor, order in [(hwc, "hwc"), (chw, "chw")]:
        result = prepare_image(tensor, order=order)
        assert result.shape == (1, 2, 2)
        assert_close(result[0, 0, 0], expected_grey(1.0, 0.0, 0.0))
        assert_close(result[0, 0, 1], expected_grey(0.0, 1.0, 0.0))
        assert_close(result[0, 1, 0], expected_grey(0.0, 0.0, 1.0))
        g = 128.0 / 255.0
        assert_close(result[0, 1, 1], expected_grey(g, g, g))
