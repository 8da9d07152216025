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


def test_dense_phase_kernel_matches_xla_engine(rng):
    """Fused integral+dense Pallas kernel (interpret mode on CPU) produces
    the identical accepted-window set as the XLA dense phase."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import face_scene
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml")
    frames = np.stack([
        face_scene(96, 72, faces=((48, 36, 28),), noise=8, seed=s)
        for s in range(2)
    ])
    gray = jnp.asarray(frames)
    eng_xla = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=False)
    eng_pk = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=True)
    assert eng_pk._use_pallas_dense
    total = 0
    for a, b in zip(eng_xla.candidates(gray), eng_pk.candidates(gray)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
        total += len(a)
    assert total > 0  # non-vacuous: the scene actually fires the cascade
