"""Morphology ops vs OpenCV golden values (same kernels the reference uses)."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.ops import morphology as M


@pytest.fixture
def gray():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    img[rng.random((64, 96)) < 0.3] = 0.0
    return img


@pytest.mark.parametrize("k", [3, 5, 9])
def test_erode_matches_cv2(gray, k):
    kernel = np.ones((k, k), np.uint8)
    want = cv2.erode(gray, kernel)
    got = np.asarray(M.erode(jnp.asarray(gray), k))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 9])
def test_dilate_matches_cv2(gray, k):
    kernel = np.ones((k, k), np.uint8)
    want = cv2.dilate(gray, kernel)
    got = np.asarray(M.dilate(jnp.asarray(gray), k))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 6, 9])
def test_open_close_match_cv2(gray, k):
    kernel = np.ones((k, k), np.uint8)
    want_open = cv2.morphologyEx(gray, cv2.MORPH_OPEN, kernel)
    want_close = cv2.morphologyEx(gray, cv2.MORPH_CLOSE, kernel)
    np.testing.assert_allclose(np.asarray(M.opening(jnp.asarray(gray), k)), want_open, atol=1e-5)
    np.testing.assert_allclose(np.asarray(M.closing(jnp.asarray(gray), k)), want_close, atol=1e-5)


def test_box_smooth_matches_cv2(gray):
    want = cv2.filter2D(gray, -1, np.ones((5, 5), np.float32) / 25.0)
    got = np.asarray(M.box_smooth(jnp.asarray(gray), 5))
    np.testing.assert_allclose(got, want, atol=1e-3)
