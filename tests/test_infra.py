"""Infrastructure tests: native ingest feeder, stream scheduler, tracing,
config knobs, CNN model + sharded training."""

import numpy as np
import cv2
import pytest

import jax
import jax.numpy as jnp

from nubomedia_vca_tpu.cpp.ingest_binding import make_ingest, PythonIngest
from nubomedia_vca_tpu.pipeline.scheduler import StreamFeeder
from nubomedia_vca_tpu.utils.tracing import Tracer
from nubomedia_vca_tpu.utils.config import (
    FACE_KNOBS, TRACKER_KNOBS, apply_knobs,
)
from nubomedia_vca_tpu.models.face import FaceDetectorConfig
from nubomedia_vca_tpu.models.tracker import TrackerConfig
from nubomedia_vca_tpu.models import cnn


def test_ingest_exact_color_and_order(rng):
    ing = make_ingest(64, 48, capacity=16)
    g = rng.randint(0, 256, (48, 64)).astype(np.uint8)
    bgr = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    bgra = rng.randint(0, 256, (48, 64, 4)).astype(np.uint8)
    ing.push(0, g, 1)
    ing.push(1, bgr, 2)
    ing.push(2, bgra, 3)
    frames, pts, streams = ing.collect(8)
    assert frames.shape == (3, 48, 64)
    assert pts.tolist() == [1, 2, 3] and streams.tolist() == [0, 1, 2]
    assert np.array_equal(frames[0], g)
    assert np.array_equal(frames[1], cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY))
    assert np.array_equal(frames[2], cv2.cvtColor(bgra, cv2.COLOR_BGRA2GRAY))


def test_ingest_python_fallback_matches(rng):
    ing = PythonIngest(32, 24, capacity=4)
    g = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    for i in range(6):
        ing.push(0, g, i)
    assert ing.pending() == 4 and ing.dropped == 2


def test_stream_feeder_batches(rng):
    feeder = StreamFeeder(32, 24, batch=4)
    for s in range(3):
        feeder.push(s, rng.randint(0, 256, (24, 32)).astype(np.uint8), s * 10)
    frames, pts, streams, n = feeder.next_batch()
    assert frames.shape == (4, 24, 32)   # padded to static batch
    assert n == 3
    assert streams[3] == -1              # padding marked


def test_tracer():
    t = Tracer()
    with t.trace("x"):
        pass
    t.count("frames", 5)
    rep = t.report()
    assert "x" in rep and "frames" in rep
    assert t.sections["x"].count == 1


def test_config_knobs_clamp():
    cfg = FaceDetectorConfig()
    apply_knobs(cfg, FACE_KNOBS, {"multi-scale-factor": 999,
                                  "track-threshold": 10})
    assert cfg.multi_scale_factor == 51      # clamped to g_param_spec range
    assert cfg.track_threshold == 10
    with pytest.raises(KeyError):
        apply_knobs(cfg, FACE_KNOBS, {"bogus": 1})
    tcfg = TrackerConfig()
    apply_knobs(tcfg, TRACKER_KNOBS, {"distance": 70})
    assert tcfg.distance == 70


def test_cnn_forward_and_train_step(rng):
    params = cnn.init_params(jax.random.PRNGKey(0), channels=(8, 8, 8, 8),
                             head_dim=16)
    gray = jnp.asarray(rng.randint(0, 256, (2, 64, 64)).astype(np.uint8))
    out = cnn.forward(params, gray)
    assert out.shape == (2, 4, 4, 5)
    boxes = jnp.asarray(rng.randint(0, 40, (2, 3, 4)).astype(np.float32))
    valid = jnp.asarray([[True, True, False], [True, False, False]])
    obj_t, reg_t = cnn.boxes_to_targets(boxes, valid, 64, 64)
    optimizer = cnn.make_optimizer()
    opt_state = optimizer.init(params)
    import functools
    step = jax.jit(functools.partial(cnn.train_step, optimizer=optimizer))
    p2, _, loss = step(params, opt_state, gray, obj_t, reg_t)
    assert np.isfinite(float(loss))
    # params actually moved
    assert not np.allclose(np.asarray(p2["head2"]["w"]),
                           np.asarray(params["head2"]["w"]))


def test_cnn_letterbox_params():
    """Aspect-preserving inference geometry (cnn.letterbox_params): 4:3
    frames degenerate to the identity (no behavior change for the
    synthetic eval), non-4:3 frames scale uniformly and center inside
    the canvas — the round-3 fix for squashed real portraits and the
    frame_w-only y mis-scale."""
    # 4:3: exact fill, no offsets
    assert cnn.letterbox_params(640, 480, 320, 240) == (320, 240, 0, 0)
    assert cnn.letterbox_params(320, 240, 320, 240) == (320, 240, 0, 0)
    # portrait (Grace Hopper is 512×600): height-limited, x-centered
    rw, rh, ox, oy = cnn.letterbox_params(512, 600, 320, 240)
    assert rh == 240 and oy == 0 and ox == (320 - rw) // 2
    assert abs(rw / 512 - rh / 600) < 2 / 512      # uniform scale
    # wide: width-limited, y-centered
    rw, rh, ox, oy = cnn.letterbox_params(1280, 720, 320, 240)
    assert rw == 320 and ox == 0 and rh == 180 and oy == 30


def test_cnn_letterbox_box_roundtrip(rng):
    """detect_boxes maps work-space boxes back through the letterbox:
    a detector built for a non-4:3 frame applies ONE uniform scale and
    subtracts the canvas offsets, so x and y land in original pixels."""
    params = cnn.init_params(jax.random.PRNGKey(0), channels=(8, 8, 8, 8),
                             head_dim=16)
    det = cnn.CnnFaceDetector((512, 600), params=params, threshold=-1.0)
    # threshold -1 → every top-k cell valid
    gray = rng.randint(0, 256, (600, 512)).astype(np.uint8)
    got = det.detect_boxes(gray)[0]
    assert len(got) > 0
    assert abs(det.scale_back - 512 / det._rw) < 1e-9
    # x AND y both unmap through the one uniform scale + canvas offsets
    raw_b, _, raw_v = det._detect_jit(jnp.asarray(gray[None]))
    raw = np.asarray(raw_b)[0][np.asarray(raw_v)[0]]
    expect = (raw - np.array([det._ox, det._oy, 0, 0], np.float32)) \
        * det.scale_back
    assert np.array_equal(got, np.rint(expect).astype(np.int32))


def test_boxes_to_targets_neighborhood():
    """Target encoding (boxes_to_targets): center cell positive (+1),
    3×3 ring ignore (-1), everything else negative (0); every supervised
    cell's regression decodes to the SAME box, so near-miss neighbor
    detections collapse in NMS instead of surviving as false positives."""
    box = jnp.asarray([[[64.0, 80.0, 32.0, 48.0]]])   # cx=80, cy=104
    valid = jnp.asarray([[True]])
    obj, reg = cnn.boxes_to_targets(box, valid, 160, 160)
    obj, reg = np.asarray(obj), np.asarray(reg)
    gx, gy = 80 // 16, 104 // 16
    assert obj[0, gy, gx] == 1.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            assert obj[0, gy + dy, gx + dx] == -1.0
    assert (obj != 0).sum() == 9
    # every supervised cell decodes to the same box
    for yy in range(obj.shape[1]):
        for xx in range(obj.shape[2]):
            if obj[0, yy, xx] == 0:
                assert np.all(reg[0, yy, xx] == 0)
                continue
            t = reg[0, yy, xx]
            assert abs((xx + t[0]) * 16 - 80.0) < 1e-4
            assert abs((yy + t[1]) * 16 - 104.0) < 1e-4
            assert abs(np.exp(t[2]) * 16 - 32.0) < 1e-3
            assert abs(np.exp(t[3]) * 16 - 48.0) < 1e-3


def test_boxes_to_targets_ignore_boxes():
    """Ignore boxes (teacher-missed faces, distill.label_batch) mark
    covered cells -2: no objectness gradient, no regression — and never
    demote a positive or its ring."""
    boxes = jnp.asarray([[[64.0, 80.0, 32.0, 48.0]]])
    valid = jnp.asarray([[True]])
    ign = jnp.asarray([[[0.0, 0.0, 40.0, 40.0]]])     # top-left corner
    ign_v = jnp.asarray([[True]])
    obj, reg = cnn.boxes_to_targets(boxes, valid, 160, 160, ign, ign_v)
    obj = np.asarray(obj)
    # cells with centers inside [0,40]² → (0,0)..(2,2) minus face overlap
    assert obj[0, 0, 0] == -2.0 and obj[0, 2, 2] == -2.0
    assert (obj == -2).sum() == 9
    # face center/ring unaffected
    gx, gy = 80 // 16, 104 // 16
    assert obj[0, gy, gx] == 1.0 and obj[0, gy - 1, gx - 1] == -1.0
    # loss accepts the -2 state (pure ignore) and stays finite
    params = cnn.init_params(jax.random.PRNGKey(0), channels=(4, 4, 4, 4),
                             head_dim=8)
    gray = jnp.zeros((1, 160, 160), jnp.uint8)
    (l_ign, _), _ = jax.value_and_grad(cnn.loss_fn, has_aux=True)(
        params, gray, obj, reg)
    assert np.isfinite(float(l_ign))


def test_boxes_to_targets_adjacent_faces():
    """A cell that is the CENTER of one face and a ring-neighbor of
    another stays positive (+1), and its regression carries its OWN
    face's box (center scatter wins conflicts)."""
    boxes = jnp.asarray([[[64.0, 64.0, 32.0, 32.0],     # center (80,80)
                          [96.0, 64.0, 32.0, 32.0]]])   # center (112,80)
    valid = jnp.asarray([[True, True]])
    obj, reg = cnn.boxes_to_targets(boxes, valid, 160, 160)
    obj, reg = np.asarray(obj), np.asarray(reg)
    for cx in (80.0, 112.0):
        gx, gy = int(cx) // 16, 80 // 16
        assert obj[0, gy, gx] == 1.0
        t = reg[0, gy, gx]
        assert abs((gx + t[0]) * 16 - cx) < 1e-4


def test_cnn_ctx_conv(rng):
    """The dilated context conv (init_params ctx=True): widens the
    receptive field (a far-away pixel change must reach the output only
    WITH ctx), applies residually, and no-ops for ctx-less checkpoints."""
    gray = jnp.asarray(rng.randint(0, 256, (1, 256, 256)).astype(np.uint8))
    far = np.asarray(gray).copy()
    far[0, 136, 136] ^= 0x7f        # grid cell (8,8): 64 px / 4 cells from
    #                                 the probed cell — exactly ctx's reach
    plain = cnn.init_params(jax.random.PRNGKey(0), channels=(8, 8, 8, 8),
                            head_dim=16)
    ctx = cnn.init_params(jax.random.PRNGKey(0), channels=(8, 8, 8, 8),
                          head_dim=16, ctx=True)
    assert "ctx" in ctx and "ctx" not in plain
    # apply_ctx is the identity without a ctx entry
    feats = cnn.backbone(plain, gray)
    assert np.array_equal(np.asarray(cnn.apply_ctx(plain, feats)),
                          np.asarray(feats))
    cell = (0, 12, 12)              # grid cell at pixel ~(192, 192)
    d_plain = (cnn.forward(plain, jnp.asarray(far)) -
               cnn.forward(plain, gray))[cell]
    d_ctx = (cnn.forward(ctx, jnp.asarray(far)) -
             cnn.forward(ctx, gray))[cell]
    # stride-16 grid, 3x3 convs: plain RF ~31 px — the 64 px-away probe
    # pixel cannot influence the cell; ctx (dil-4 on the grid) can reach it
    assert float(jnp.abs(d_plain).max()) == 0.0
    assert float(jnp.abs(d_ctx).max()) > 0.0


def test_cnn_ctx_int8_matches_f32(rng):
    """forward_int8 with a ctx entry follows cnn.forward within
    quantization tolerance (the int8 serving path covers the shipped
    ctx architecture)."""
    from nubomedia_vca_tpu.models import quant

    params = cnn.init_params(jax.random.PRNGKey(2), channels=(8, 8, 8, 8),
                             head_dim=16, ctx=True)
    gray = jnp.asarray(rng.randint(0, 256, (2, 64, 64)).astype(np.uint8))
    f32 = np.asarray(cnn.forward(params, gray), np.float32)
    i8 = np.asarray(quant.forward_int8(quant.quantize_params(params), gray))
    # fresh random params produce small outputs; scale-aware tolerance
    tol = 0.05 * max(float(np.abs(f32).max()), 1e-3) + 0.02
    assert np.abs(i8 - f32).max() <= tol, float(np.abs(i8 - f32).max())


def test_cnn_loss_decreases(rng):
    params = cnn.init_params(jax.random.PRNGKey(1), channels=(8, 8, 8, 8),
                             head_dim=16)
    gray = jnp.asarray(rng.randint(0, 256, (4, 64, 64)).astype(np.uint8))
    boxes = jnp.asarray(rng.randint(0, 40, (4, 2, 4)).astype(np.float32) + 8)
    valid = jnp.ones((4, 2), bool)
    obj_t, reg_t = cnn.boxes_to_targets(boxes, valid, 64, 64)
    optimizer = cnn.make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    import functools
    step = jax.jit(functools.partial(cnn.train_step, optimizer=optimizer))
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, gray, obj_t, reg_t)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


# full tier: ~400 s of XLA:CPU compile+run on this 1-core host, and the
# driver independently executes dryrun_multichip every round
# (MULTICHIP_r*.json), so the default tier keeps only the cheap
# single-chip compile check below plus the sharded-serving gate in
# test_misc.py (VERDICT r4 item 3)
@pytest.mark.full
def test_sharded_training_on_virtual_mesh():
    import __graft_entry__ as g
    n = jax.device_count()
    assert n >= 8, "conftest should provide 8 virtual CPU devices"
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].ndim == 3


def test_init_distributed_single_process():
    """Multi-host bring-up path (parallel/mesh.init_distributed →
    jax.distributed.initialize over DCN), exercised as a 1-process
    cluster in a subprocess so the coordinator service doesn't leak
    global state into this test process."""
    import subprocess
    import sys

    import os

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nubomedia_vca_tpu.parallel.mesh import init_distributed, "
        "make_mesh\n"
        "init_distributed('localhost:19731', num_processes=1, process_id=0)\n"
        "assert jax.process_count() == 1\n"
        "mesh = make_mesh()\n"
        "print('mesh', mesh.shape)\n"
    )
    # JAX_PLATFORMS must be in the env BEFORE the interpreter starts: the
    # axon sitecustomize imports jax at startup, which caches the env-var
    # read (an os.environ set inside the child would be ignored)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert "mesh" in out.stdout
