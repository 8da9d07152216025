"""Bit-parity tests for image ops vs OpenCV (python cv2 5.0 primitives and the
C++ OpenCV 4.6 golden tool)."""

import numpy as np
import cv2
import pytest

import jax.numpy as jnp

from nubomedia_vca_tpu.ops.integral import (
    integral_image, sq_integral_image, tilted_integral_image,
    integral_np, tilted_integral_np,
)
from nubomedia_vca_tpu.ops.color import bgr_to_gray, bgra_to_gray
from nubomedia_vca_tpu.ops.histogram import equalize_hist
from nubomedia_vca_tpu.ops.resize import resize_linear_exact

from .golden import opencv_golden as gold


def test_integral_matches_cv2(rng):
    img = rng.randint(0, 256, (37, 53)).astype(np.uint8)
    s, sq, t = cv2.integral3(img)
    ii = np.asarray(integral_image(jnp.asarray(img)))
    assert np.array_equal(ii, s.astype(np.int64))
    tt = np.asarray(tilted_integral_image(jnp.asarray(img)))
    assert np.array_equal(tt, t.astype(np.int64))


def test_sq_integral_wraparound_local_sums_exact(rng):
    """int32-wrapping sq integral gives exact local 4-corner sums."""
    H, W = 400, 1280  # total sq-sum overflows int32 well before this size
    img = rng.randint(0, 256, (H, W)).astype(np.uint8)
    sq = np.asarray(sq_integral_image(jnp.asarray(img))).astype(np.uint32)
    exact = np.cumsum(np.cumsum(img.astype(np.int64) ** 2, -1), -2)
    exact = np.pad(exact, [(1, 0), (1, 0)])
    assert exact[-1, -1] > 2**31  # the table itself really does overflow
    # random 18x18 norm-rect style local sums recovered exactly mod 2^32
    with np.errstate(over="ignore"):
        for _ in range(50):
            y = rng.randint(0, H - 18)
            x = rng.randint(0, W - 18)
            want = exact[y + 18, x + 18] - exact[y, x + 18] - exact[y + 18, x] + exact[y, x]
            got = (sq[y + 18, x + 18] - sq[y, x + 18]
                   - sq[y + 18, x] + sq[y, x])
            assert int(got) == int(want)


def test_tilted_integral_batched(rng):
    imgs = rng.randint(0, 256, (3, 15, 21)).astype(np.uint8)
    out = np.asarray(tilted_integral_image(jnp.asarray(imgs)))
    for i in range(3):
        _, _, t = cv2.integral3(imgs[i])
        assert np.array_equal(out[i], t.astype(np.int64))


def test_tilted_np_twin(rng):
    img = rng.randint(0, 256, (11, 13)).astype(np.uint8)
    _, _, t = cv2.integral3(img)
    assert np.array_equal(tilted_integral_np(img), t.astype(np.int64))
    s = integral_np(img)
    ss, _, _ = cv2.integral3(img)
    assert np.array_equal(s, ss.astype(np.int64))


def test_bgr_to_gray_exact(rng):
    img = rng.randint(0, 256, (33, 47, 3)).astype(np.uint8)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    got = np.asarray(bgr_to_gray(jnp.asarray(img)))
    assert np.array_equal(got, want)
    img4 = rng.randint(0, 256, (33, 47, 4)).astype(np.uint8)
    want4 = cv2.cvtColor(img4, cv2.COLOR_BGRA2GRAY)
    got4 = np.asarray(bgra_to_gray(jnp.asarray(img4)))
    assert np.array_equal(got4, want4)


@pytest.mark.parametrize("case", ["random", "constant", "two_values", "face"])
def test_equalize_hist_exact(rng, case):
    if case == "random":
        img = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    elif case == "constant":
        img = np.full((20, 20), 7, np.uint8)
    elif case == "two_values":
        img = np.where(rng.rand(32, 32) < 0.3, 10, 200).astype(np.uint8)
    else:
        from .fixtures import face_scene
        img = face_scene(160, 120, faces=((80, 60, 30),))
    want = cv2.equalizeHist(img)
    got = np.asarray(equalize_hist(jnp.asarray(img)))
    assert np.array_equal(got, want), np.abs(got.astype(int) - want.astype(int)).max()
    # and vs the C++ 4.6 golden (should agree with cv2 5.0)
    want46 = gold.equalize_hist(img)
    assert np.array_equal(got, want46)


@pytest.mark.parametrize("shape", [((192, 67), (77, 127)), ((35, 116), (122, 120)),
                                   ((480, 640), (160, 120)), ((13, 9), (9, 13))])
def test_resize_linear_exact_bit_parity(rng, shape):
    (sh, sw), (dw, dh) = shape
    img = rng.randint(0, 256, (sh, sw)).astype(np.uint8)
    want = gold.resize(img, dw, dh, 5)  # INTER_LINEAR_EXACT
    got = np.asarray(resize_linear_exact(jnp.asarray(img), (dw, dh)))
    assert np.array_equal(got, want)


def test_resize_linear_exact_batched(rng):
    imgs = rng.randint(0, 256, (4, 37, 53)).astype(np.uint8)
    got = np.asarray(resize_linear_exact(jnp.asarray(imgs), (20, 28)))
    for i in range(4):
        want = gold.resize(imgs[i], 20, 28, 5)
        assert np.array_equal(got[i], want)
