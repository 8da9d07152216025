"""Pallas TPU kernels — interpret-mode correctness on CPU (the real-TPU run
is exercised by bench/driver; kernels are exact by construction)."""

import numpy as np
import jax.numpy as jnp

from nubomedia_vca_tpu.ops.pallas.integral_pallas import (
    integral_images_pallas, integral_image_matmul,
)


def _want(img):
    ii = np.pad(np.cumsum(np.cumsum(img.astype(np.int64), -1), -2),
                [(0, 0), (1, 0), (1, 0)])
    sq = np.pad(np.cumsum(np.cumsum(img.astype(np.int64) ** 2, -1), -2),
                [(0, 0), (1, 0), (1, 0)])
    return ii, sq


def test_pallas_integral_interpret(rng):
    img = rng.randint(0, 256, (3, 90, 160)).astype(np.uint8)
    want_ii, want_sq = _want(img)
    ii, sq = integral_images_pallas(jnp.asarray(img), interpret=True)
    assert np.array_equal(np.asarray(ii), want_ii)
    # sq wraps in int32; compare mod 2^32
    assert np.array_equal(np.asarray(sq).astype(np.uint32),
                          want_sq.astype(np.uint32))


def test_pallas_integral_nonaligned_sizes(rng):
    img = rng.randint(0, 256, (2, 37, 53)).astype(np.uint8)
    want_ii, _ = _want(img)
    ii, _ = integral_images_pallas(jnp.asarray(img), interpret=True)
    assert np.array_equal(np.asarray(ii), want_ii)


def test_integral_matmul_exact(rng):
    img = rng.randint(0, 256, (2, 90, 160)).astype(np.uint8)
    want_ii, _ = _want(img)
    got = np.asarray(integral_image_matmul(jnp.asarray(img)))
    assert np.array_equal(got, want_ii)
