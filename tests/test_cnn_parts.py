"""Shipped multi-part CNN checkpoint gates + NuboCnnPartDetector surface.

The learned multi-part detector (models/cnn_parts.py) collapses the
reference's face→eye/nose/mouth chained-cascade flow (SURVEY.md §2.4.8,
kmseyedetect.cpp:680-724) into one conv pass. These tests gate the SHIPPED
checkpoint's per-class recall/precision on the exact synthetic geometry it
was supervised on, and exercise the remote-object surface (OnPart events,
state-preserving setThreshold).
"""

import numpy as np
import pytest

from nubomedia_vca_tpu.models import cnn, cnn_parts

# measured on the shipped checkpoint at threshold 0.7 (TPU):
#   face 0.956/0.935, eye 0.967/0.879, nose 0.978/0.917, mouth 0.978/0.830
# gates leave margin for CPU-vs-TPU numeric drift in the bf16 conv path
RECALL_GATE = 0.90
PRECISION_GATE = 0.72


def test_checkpoint_exists():
    assert cnn.find_checkpoint(cnn_parts.DEFAULT_CHECKPOINT) is not None


def test_per_class_recall_precision():
    stats = cnn_parts.evaluate(n_scenes=48, seed=123)
    for k, (tp, fn, fp) in stats.items():
        recall = tp / max(tp + fn, 1)
        precision = tp / max(tp + fp, 1)
        assert recall >= RECALL_GATE, (k, recall, precision, tp, fn, fp)
        assert precision >= PRECISION_GATE, (k, recall, precision, tp, fn, fp)


def _scene_with_face():
    from nubomedia_vca_tpu.models.synth import draw_face, _noise_bg

    rng = np.random.RandomState(7)
    img = _noise_bg(rng, cnn_parts.W, cnn_parts.H)
    geo = draw_face(img, 160, 120, 55)
    return img, geo


def test_detector_finds_all_classes():
    img, geo = _scene_with_face()
    det = cnn_parts.CnnPartDetector((cnn_parts.W, cnn_parts.H))
    res = det.process(img)[0]
    for k in cnn_parts.CLASSES:
        assert len(res[k]) >= 1, (k, res)
    # face box roughly where drawn
    fx, fy, fw, fh = res["face"][0]
    gx, gy, gw, gh = geo["face"]
    assert abs(fx + fw / 2 - (gx + gw / 2)) < 25
    assert abs(fy + fh / 2 - (gy + gh / 2)) < 25


def test_remote_object_events_and_live_threshold():
    from nubomedia_vca_tpu.api.objects import MediaPipeline, \
        NuboCnnPartDetector

    img, _ = _scene_with_face()
    pipe = MediaPipeline(frame_size=(cnn_parts.W, cnn_parts.H))
    el = NuboCnnPartDetector(pipe)
    el.activateServerEvents(1, 0)
    got = []
    el.addEventListener("OnPart", got.append)
    el.process(img)
    assert got, "no OnPart event"
    names = {i.name for i in got[0]["partInfo"]}
    assert "face" in names and names & {"eye", "nose", "mouth"}

    # live setter keeps the loaded params (no checkpoint reload / retrain)
    params_before = el._model.params
    el.setThreshold(0.95)
    el.process(img)
    assert el._model.params is params_before
    assert el._model.threshold == 0.95


def test_idl_and_rpc_include_part_module():
    from nubomedia_vca_tpu.api.idl import MODULES
    from nubomedia_vca_tpu.api.rpc import CREATABLE

    assert MODULES["nubocnnpartdetector"] == (
        "NuboCnnPartDetector", "OnPart", "PartInfo")
    assert "NuboCnnPartDetector" in CREATABLE
