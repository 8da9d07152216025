"""Pallas TPU kernels — interpret-mode correctness on CPU (the real-TPU run
is exercised by bench/driver; kernels are exact by construction)."""

import numpy as np
import jax.numpy as jnp
import pytest

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
    # the sf=1.25 pyramid's early levels have ystep=2, so this parity run
    # exercises the kernel's strided-grid emission path non-vacuously
    assert any(l.ystep == 2 and eng_pk._pallas_dense_fits(l)
               for l in eng_pk.levels)
    total = 0
    for a, b in zip(eng_xla.candidates(gray), eng_pk.candidates(gray)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
        total += len(a)
    assert total > 0  # non-vacuous: the scene actually fires the cascade


# full tier (round-5 --durations): the strip-tiling generation's parity
# is a deeper sweep of a surface the default tier still gates twice —
# dense-kernel parity (above) and pyramid-chunk parity (below) cover the
# fused dense phase, and test_pallas_failure_falls_back_to_xla_phase
# keeps the fallback tier that selects the strip path default-gated.
@pytest.mark.full
def test_dense_phase_strip_kernel_matches_xla_engine(rng):
    """Levels above the single-block VMEM cap run the ROW-STRIP variant of
    the fused dense kernel (strip-local integral + h0-row halo; rect corner
    sums are translation-invariant so results are bit-identical). Window
    sets must equal the XLA dense phase, non-vacuously."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import face_scene
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from nubomedia_vca_tpu.ops.pallas.dense_pallas import dense_strip_plan

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_eye.xml")
    frames = np.stack([
        face_scene(320, 200, faces=((80, 100, 60), (240, 100, 70)),
                   noise=8, seed=s)
        for s in range(2)
    ])
    gray = jnp.asarray(frames)
    eng_xla = CascadeEngine(casc, (320, 200), 2.0, use_pallas_dense=False)
    eng_pk = CascadeEngine(casc, (320, 200), 2.0, use_pallas_dense=True)
    l0 = eng_pk.levels[0]
    assert (l0.sh + 1) * (l0.sw + 1) > eng_pk.PALLAS_DENSE_MAX_ELEMS
    plan = dense_strip_plan(l0.sh, l0.sw, casc.window_h,
                            eng_pk.PALLAS_DENSE_MAX_ELEMS)
    assert plan is not None and plan[1] >= 2   # really multi-strip
    assert eng_pk._pallas_dense_fits(l0)
    total = 0
    for a, b in zip(eng_xla.candidates(gray), eng_pk.candidates(gray)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
        total += len(a)
    assert total > 0


def test_stride_select_bit_exact(rng):
    """The one-hot-matmul row/column selection the strided dense kernel
    uses (Mosaic rejects strided vector slices) must be BIT-identical to
    a numpy strided gather, including on f32 values that don't round-trip
    through bf16 — Precision.HIGHEST reconstructs each operand exactly."""
    import jax
    from nubomedia_vca_tpu.ops.pallas.dense_pallas import _stride_select

    for shape in [(64, 96), (63, 95), (32, 33)]:
        # full f32 mantissas: tiny ulp-level differences would betray a
        # bf16-truncated matmul
        m = np.float32(rng.standard_normal(shape) * 1e3 + 0.1234567)
        for step in (1, 2, 3):
            got = np.asarray(jax.jit(_stride_select,
                                     static_argnums=1)(jnp.asarray(m), step))
            want = m[::step, ::step]
            assert got.shape == want.shape
            assert np.array_equal(got, want), (shape, step)


def test_pallas_failure_falls_back_to_xla_phase(rng, monkeypatch):
    """Last recovery tier: if a Pallas kernel cannot be built/lowered on
    this backend, detect_raw must still return the (bit-identical) XLA
    phase's result — whole-pyramid → per-level → kernels-disabled chain —
    instead of surfacing the backend error to the serving loop."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import face_scene
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from nubomedia_vca_tpu.ops.pallas import dense_pallas

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml")
    img = jnp.asarray(face_scene(96, 72, faces=((48, 36, 28),), noise=8))

    def boom(*a, **k):
        raise RuntimeError("simulated Mosaic lowering failure")

    monkeypatch.setattr(dense_pallas, "build_dense_phase", boom)
    monkeypatch.setattr(dense_pallas, "build_pyramid_dense_phase", boom)
    eng = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=True)
    boxes, valid, _ = (np.asarray(x) for x in eng.detect_raw(img))
    assert not eng._use_pallas_dense          # kernels dropped engine-wide
    ref = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=False)
    rboxes, rvalid, _ = (np.asarray(x) for x in ref.detect_raw(img))
    got = boxes[0][valid[0].astype(bool)]
    want = rboxes[0][rvalid[0].astype(bool)]
    assert len(want) > 0
    assert np.array_equal(np.sort(got, axis=0), np.sort(want, axis=0))


# full tier: the tilted fused path keeps a default-tier gate via
# test_dense_phase_tilted_full_path_nonvacuous (46 s vs 116 s)
@pytest.mark.full
def test_dense_phase_kernel_tilted_cascade(rng):
    """Tilt-using cascade (lefteye_2splits: 186 tilted features) through the
    fused kernel — in-kernel skewed-prefix-sum RSAT + tilted corner reads
    produce the identical window set as the XLA phase, and the kernel's
    emitted tilted table feeds the survivor patch gather."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import face_scene
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_lefteye_2splits.xml")
    assert casc.has_tilted
    frames = np.stack([
        face_scene(96, 72, faces=((48, 36, 30),), noise=10, seed=s)
        for s in range(2)
    ])
    gray = jnp.asarray(frames)
    eng_xla = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=False)
    eng_pk = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=True)
    assert eng_pk._use_pallas_dense and eng_pk._uses_tilt
    for a, b in zip(eng_xla.candidates(gray), eng_pk.candidates(gray)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))


def test_dense_phase_tilted_full_path_nonvacuous(rng):
    """Truncated tilted cascade (4 stages: 3 dense + 1 matmul block) on
    noise, so windows SURVIVE to the end — non-vacuous full-path parity:
    the kernel-emitted tilted table feeds the survivor patch gather and
    the kernel's vnf multiplies the matmul-stage features. Verified
    equal on real TPU as well (windows found and identical)."""
    import dataclasses
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_lefteye_2splits.xml")
    K = 4
    keep = casc.weak_stage < K
    trunc = dataclasses.replace(
        casc,
        feat0=casc.feat0[keep], thr0=casc.thr0[keep],
        featL=casc.featL[keep], thrL=casc.thrL[keep],
        leavesL=casc.leavesL[keep],
        featR=casc.featR[keep], thrR=casc.thrR[keep],
        leavesR=casc.leavesR[keep],
        weak_stage=casc.weak_stage[keep],
        stage_thresholds=casc.stage_thresholds[:K])
    img = jnp.asarray(rng.randint(0, 256, (4, 40, 48)).astype(np.uint8))
    e_x = CascadeEngine(trunc, (48, 40), 1.25, dense_stages=3,
                        use_pallas_dense=False)
    e_p = CascadeEngine(trunc, (48, 40), 1.25, dense_stages=3,
                        use_pallas_dense=True)
    assert e_p._use_pallas_dense and e_p._dense_uses_tilt
    tot = 0
    for a, b in zip(e_x.candidates(img), e_p.candidates(img)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
        tot += len(a)
    assert tot > 0  # noise must reach the post-dense stages


def test_tilted_integral_skew_equals_scan(rng):
    from nubomedia_vca_tpu.ops.integral import (
        tilted_integral_image, tilted_integral_image_scan, tilted_integral_np)

    img = rng.randint(0, 256, (2, 41, 67)).astype(np.uint8)
    a = np.asarray(tilted_integral_image(jnp.asarray(img)))
    b = np.asarray(tilted_integral_image_scan(jnp.asarray(img)))
    assert np.array_equal(a, b)
    assert np.array_equal(a[0], tilted_integral_np(img[0]).astype(np.int32))


def test_dense_phase_kernel_tilted_intermediates(rng):
    """Non-vacuous tilt check: on noise images (where final candidates are
    empty) compare the fused kernel's intermediate outputs — ii, the
    in-kernel roll-based RSAT, vnf, and the dense alive mask — against an
    XLA replica built from the engine's own helpers at full density."""
    import jax.numpy as jnp2
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml
    from nubomedia_vca_tpu.ops.integral import (
        integral_image, sq_integral_image, tilted_integral_image)
    from nubomedia_vca_tpu.ops.pallas.dense_pallas import build_dense_phase
    import jax

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_lefteye_2splits.xml")
    # dense_stages=3: the block still contains tilted features, and random
    # noise keeps ~15 survivors, so the alive-mask comparison is non-vacuous
    eng = CascadeEngine(casc, (48, 40), 1.25, dense_stages=3,
                        use_pallas_dense=True)
    assert eng._dense_uses_tilt
    sh, sw = eng.levels[0].sh, eng.levels[0].sw
    img = jnp.asarray(rng.randint(0, 256, (2, sh, sw)).astype(np.uint8))
    kern = build_dense_phase(eng, sh, sw)
    ii_k, iit_k, vnf_k, alive_k = kern(img, interpret=True)

    gy = sh - casc.window_h + 1
    gx = sw - casc.window_w + 1

    @jax.jit   # both real paths run jitted; eager would miss the 1/sqrt →
    def replica(img):          # rsqrt rewrite and differ by 1 ulp
        ii = integral_image(img)
        iisq = sq_integral_image(img)
        iit = tilted_integral_image(img)
        valsum = eng._dense_rect_sum(ii, eng._norm_corners, gy, gx, 1)
        sqv = eng._dense_rect_sum(iisq, eng._norm_corners, gy, gx, 1)
        sq_u = jax.lax.bitcast_convert_type(sqv, jnp2.uint32)
        vf = valsum.astype(jnp2.float32)
        nf = eng._norm_area * sq_u.astype(jnp2.float32) - vf * vf
        win_valid = nf > 100.0 * eng._norm_area * eng._norm_area
        vnf = jnp2.where(win_valid,
                         1.0 / jnp2.sqrt(jnp2.maximum(nf, 1e-20)), 1.0)
        d = eng._dense
        cache = {}
        alive = win_valid
        widx = 0
        for s_idx in range(eng.n_dense_stages):
            ssum = jnp2.zeros_like(vnf)
            while widx < len(d["feat0"]) and d["stage"][widx] == s_idx:
                f0 = eng._dense_feature(ii, iit, int(d["feat0"][widx]),
                                        gy, gx, 1, cache) * vnf
                fL = eng._dense_feature(ii, iit, int(d["featL"][widx]),
                                        gy, gx, 1, cache) * vnf
                fR = eng._dense_feature(ii, iit, int(d["featR"][widx]),
                                        gy, gx, 1, cache) * vnf
                ssum = ssum + eng._weak_tree(
                    f0, fL, fR, d["thr0"][widx], d["thrL"][widx],
                    d["thrR"][widx], d["leavesL"][widx], d["leavesR"][widx])
                widx += 1
            alive = alive & (ssum >= d["stage_thr"][s_idx])
        return ii, iit, vnf, alive

    ii, iit, vnf, alive = replica(img)
    assert np.array_equal(np.asarray(ii_k), np.asarray(ii))
    assert np.array_equal(np.asarray(iit_k), np.asarray(iit))
    assert np.array_equal(np.asarray(vnf_k), np.asarray(vnf))
    alive = np.asarray(alive)
    assert alive.any(), "noise should keep some dense-phase survivors"
    assert np.array_equal(np.asarray(alive_k).astype(bool), alive)


def test_resize_matrix_bit_exact(rng):
    """The pyramid kernel's in-VMEM resize (two one-hot-weighted matmuls,
    Q8 horizontal then Q16 vertical) must be BIT-exact with
    resize_linear_exact (itself golden-verified vs cv::resize
    INTER_LINEAR_EXACT) — every product and partial sum stays < 2^24, so
    HIGHEST-precision f32 is exact integer arithmetic."""
    import jax
    from nubomedia_vca_tpu.ops.pallas.dense_pallas import _resize_matrix
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact

    hi = jax.lax.Precision.HIGHEST
    # bench headline levels (160x90 / sf=1.25) plus odd geometries
    cases = [((90, 160), (72, 128)), ((90, 160), (57, 102)),
             ((90, 160), (24, 42)), ((72, 96), (37, 49)),
             ((33, 47), (9, 13))]
    for (sh_, sw_), (dh, dw) in cases:
        src = rng.randint(0, 256, (sh_, sw_)).astype(np.uint8)
        cx = jnp.asarray(_resize_matrix(sw_, dw))
        ry = jnp.asarray(_resize_matrix(sh_, dh).T.copy())
        srcf = jnp.asarray(src).astype(jnp.float32)
        h = jax.lax.dot_general(srcf, cx, (((1,), (0,)), ((), ())),
                                precision=hi)
        v = jax.lax.dot_general(ry, h, (((1,), (0,)), ((), ())),
                                precision=hi)
        got = np.asarray(
            jnp.clip((v.astype(jnp.int32) + (1 << 15)) >> 16, 0, 255)
        ).astype(np.uint8)
        want = np.asarray(resize_linear_exact(jnp.asarray(src)[None],
                                              (dw, dh)))[0]
        assert np.array_equal(got, want), ((sh_, sw_), (dh, dw))


def test_pyramid_kernel_matches_xla_engine(rng):
    """The ALL-LEVELS fused pyramid kernel (in-kernel resize + dense phase,
    work image read once) produces the identical accepted-window set as
    the engine without it, across every pyramid level, non-vacuously."""
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
    eng_ref = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=False,
                            use_pallas_pyramid=False)
    eng_pyr = CascadeEngine(casc, (96, 72), 1.25, use_pallas_dense=True,
                            use_pallas_pyramid=True)
    lis = eng_pyr._pyramid_level_indices()
    assert len(lis) == len(eng_pyr.levels)       # every level in-kernel
    # non-vacuous strided emission + an unscaled level gathering from gray
    assert any(eng_pyr.levels[li].ystep == 2 for li in lis)
    assert (eng_pyr.levels[0].sh, eng_pyr.levels[0].sw) == (72, 96)
    total = 0
    for a, b in zip(eng_ref.candidates(gray), eng_pyr.candidates(gray)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
        total += len(a)
    assert total > 0


def _chunked_deep_engine():
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml

    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml")
    return casc, CascadeEngine(casc, (96, 72), 1.05, use_pallas_dense=True,
                               use_pallas_pyramid=True)


def test_pyramid_chunk_plan_geometry():
    """Deep pyramids (force_per_level) plan pyramid-kernel CHUNKS — a
    handful of programs instead of one per level. Chunk boundaries must
    respect the VMEM sum budget and cover consecutive levels (host-side
    plan checks; the interpret-mode execution sweep is the full-tier
    test below — the per-level-vs-chunk window-set equality itself is
    also gated cheaply by test_pyramid_kernel_matches_xla_engine)."""
    _, eng_p = _chunked_deep_engine()
    assert eng_p._force_per_level              # deep pyramid, >20 levels
    chunks = eng_p._pyramid_chunks()
    assert len(chunks) >= 2                    # budget really splits it
    items = eng_p._per_level_items()
    assert len(items) < len(eng_p.levels)      # fewer programs than levels
    for ch in chunks:
        assert list(ch) == list(range(ch[0], ch[-1] + 1))  # consecutive
        total = sum((eng_p.levels[li].sh + 1) * (eng_p.levels[li].sw + 1)
                    for li in ch)
        assert total <= eng_p.PALLAS_PYRAMID_MAX_SUM_ELEMS


@pytest.mark.full
def test_pyramid_chunks_per_level_mode(rng):
    """Full tier: the chunked deep pyramid executes (interpret mode on
    CPU) with the window set IDENTICAL to the kernels-disabled XLA
    engine, level by level."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import face_scene
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine

    casc, eng_p = _chunked_deep_engine()
    eng_r = CascadeEngine(casc, (96, 72), 1.05, use_pallas_dense=False,
                          use_pallas_pyramid=False)
    frames = np.stack([
        face_scene(96, 72, faces=((48, 36, 28),), noise=8, seed=7)])
    gray = jnp.asarray(frames)
    total = 0
    for a, b in zip(eng_r.candidates(gray), eng_p.candidates(gray)):
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
        total += len(a)
    assert total > 0
