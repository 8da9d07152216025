"""Checkpoint/resume: training state via orbax; runtime detector state."""

import os

import numpy as np
import pytest

import jax

from nubomedia_vca_tpu.models import cnn
from nubomedia_vca_tpu.models.face import FaceDetector
from nubomedia_vca_tpu.models.tracker import Tracker
from nubomedia_vca_tpu.utils.checkpoint import (
    save_train_state, load_train_state, save_runtime, load_runtime,
)

from .fixtures import face_clip, moving_blob_clip


def test_train_state_roundtrip(tmp_path, rng):
    params = cnn.init_params(jax.random.PRNGKey(0), channels=(8, 8, 8, 8),
                             head_dim=16)
    opt = cnn.make_optimizer()
    opt_state = opt.init(params)
    save_train_state(str(tmp_path), params, opt_state, step=7)
    p2, o2, step = load_train_state(str(tmp_path))
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_runtime_state_roundtrip(tmp_path):
    clip = face_clip(4)
    fd = FaceDetector((640, 480))
    fd.process(clip[:2])
    tr = Tracker((320, 240))
    tr.process(moving_blob_clip(4))

    path = os.path.join(tmp_path, "runtime.pkl")
    save_runtime(path, {"face": fd, "tracker": tr})

    fd2 = FaceDetector((640, 480))
    tr2 = Tracker((320, 240))
    load_runtime(path, {"face": fd2, "tracker": tr2})

    # resumed detector continues with identical track ids
    r1 = fd.process(clip[2:])
    r2 = fd2.process(clip[2:])
    ids1 = [[f.id for f in fr] for fr in r1]
    ids2 = [[f.id for f in fr] for fr in r2]
    assert ids1 == ids2
    boxes1 = [[f.rect() for f in fr] for fr in r1]
    boxes2 = [[f.rect() for f in fr] for fr in r2]
    assert boxes1 == boxes2

    # resumed tracker MHI state matches
    assert np.array_equal(np.asarray(tr.state.mhi), np.asarray(tr2.state.mhi))
    assert tr2.frame_idx == tr.frame_idx
