"""Native C++ data-path kernels vs scipy/PIL references."""

import numpy as np
import pytest

from vivim_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_edt_matches_scipy(lib):
    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(0)
    for shape in [(16, 16), (33, 57), (64, 64)]:
        m = (rng.random(shape) > 0.6).astype(np.uint8)
        want = distance_transform_edt(m)
        got = native.edt(m)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edge_band_matches_reference_formula(lib):
    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(1)
    masks = (rng.random((3, 40, 40)) > 0.7).astype(np.uint8)
    want = np.zeros((40, 40), np.uint8)
    for c in range(3):
        m = np.pad(masks[c], 1)
        dist = distance_transform_edt(m) + distance_transform_edt(1 - m)
        want += (dist[1:-1, 1:-1] <= 2).astype(np.uint8)
    got = native.edge_band(masks, 2.0)
    np.testing.assert_array_equal(got, want)


def test_resize_nearest_matches_pil(lib):
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (37, 53), np.uint8)
    want = np.asarray(Image.fromarray(img).resize((16, 16), Image.NEAREST))
    got = native.resize_nearest(img, 16, 16)
    np.testing.assert_array_equal(got, want)


def test_resize_bilinear_normalize_close_to_pil(lib):
    from PIL import Image

    from vivim_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 80, 3), np.uint8)
    want = np.asarray(Image.fromarray(img).resize((32, 32), Image.BILINEAR),
                      np.float32) / 255.0
    want = (want - IMAGENET_MEAN) / IMAGENET_STD
    got = native.resize_bilinear_normalize(img, 32, 32, IMAGENET_MEAN,
                                           IMAGENET_STD)
    # PIL uses fixed-point bilinear; allow small quantization differences
    assert np.mean(np.abs(got - want)) < 0.02
    assert np.max(np.abs(got - want)) < 0.3


def test_edge_band_speed_advantage(lib):
    """The native path should beat scipy substantially (it is the reason
    the extension exists); keep a loose 1.5x bound to avoid flakes."""
    import time

    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(4)
    masks = (rng.random((3, 256, 256)) > 0.7).astype(np.uint8)

    t0 = time.time()
    for _ in range(5):
        native.edge_band(masks, 2.0)
    native_t = time.time() - t0

    t0 = time.time()
    for _ in range(5):
        emap = np.zeros((256, 256), np.uint8)
        for c in range(3):
            m = np.pad(masks[c], 1)
            dist = (distance_transform_edt(m)
                    + distance_transform_edt(1 - m))
            emap += (dist[1:-1, 1:-1] <= 2).astype(np.uint8)
    scipy_t = time.time() - t0
    assert native_t < scipy_t * 1.5, (native_t, scipy_t)


def test_color_enhance_rejects_non_rgb_shape():
    """Non-(H,W,3) input returns None (PIL fallback) instead of letting the
    C++ kernel overrun the buffer (ADVICE r2 hardening)."""
    import numpy as np

    from vivim_tpu import native

    gray = np.zeros((8, 8), np.uint8)
    assert native.color_enhance(gray, 1.1, 1.0, 1.0, 1.0) is None
    rgba = np.zeros((8, 8, 4), np.uint8)
    assert native.color_enhance(rgba, 1.1, 1.0, 1.0, 1.0) is None
