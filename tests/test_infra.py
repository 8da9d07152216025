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
