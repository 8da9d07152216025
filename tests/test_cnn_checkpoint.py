"""Shipped CNN checkpoint quality gate.

The learned detector (models/cnn.py) is distilled from the golden-verified
cascade teacher (models/distill.py). This test loads the SHIPPED checkpoint
and gates its recall/precision against frozen teacher labels
(tests/data/cnn_eval_labels.npz — cascade detect_grouped output on scenes
regenerated deterministically from the stored seed), so the published model
is verified, not just the training scaffold.
"""

import numpy as np
import pytest

from nubomedia_vca_tpu.models import cnn, distill

IOU_GATE = 0.5
RECALL_GATE = 0.95   # measured 1.000 on the shipped checkpoint (TPU + CPU)
PRECISION_GATE = 0.85  # measured 0.902 @ threshold 0.5


def _iou(a, b):
    ax1, ay1 = a[0] + a[2], a[1] + a[3]
    bx1, by1 = b[0] + b[2], b[1] + b[3]
    iw = max(0.0, min(ax1, bx1) - max(a[0], b[0]))
    ih = max(0.0, min(ay1, by1) - max(a[1], b[1]))
    inter = iw * ih
    return inter / max(a[2] * a[3] + b[2] * b[3] - inter, 1e-9)


@pytest.fixture(scope="module")
def eval_data():
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "cnn_eval_labels.npz")
    d = np.load(path)
    rng = np.random.RandomState(int(d["seed"]))
    scenes = np.stack([distill.make_scene(rng) for _ in range(int(d["n"]))])
    return scenes, d["boxes"], d["valid"], d["ignore"], d["ignore_valid"]


def test_checkpoint_exists():
    assert cnn.find_checkpoint() is not None


def test_checkpoint_recall_precision(eval_data):
    """Student boxes on IGNORE regions (drawn faces the cascade teacher
    missed — the student out-generalizing its teacher) count neither as
    TP nor FP; see distill.label_batch."""
    scenes, t_boxes, t_valid, i_boxes, i_valid = eval_data
    det = cnn.CnnFaceDetector((distill.W, distill.H))
    s_boxes = det.detect_boxes(scenes)

    tp = fn = fp = 0
    for i in range(scenes.shape[0]):
        teach = [t_boxes[i, j] for j in range(t_boxes.shape[1])
                 if t_valid[i, j]]
        ign = [i_boxes[i, j] for j in range(i_boxes.shape[1])
               if i_valid[i, j]]
        stud = list(s_boxes[i])
        used = set()
        for t in teach:
            best, best_iou = None, IOU_GATE
            for k, s in enumerate(stud):
                if k in used:
                    continue
                v = _iou(t, s)
                if v >= best_iou:
                    best, best_iou = k, v
            if best is None:
                fn += 1
            else:
                tp += 1
                used.add(best)
        for k, s in enumerate(stud):
            if k not in used and not any(_iou(g, s) >= 0.3 for g in ign):
                fp += 1
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    assert recall >= RECALL_GATE, (recall, precision, tp, fn, fp)
    assert precision >= PRECISION_GATE, (recall, precision, tp, fn, fp)


def test_checkpoint_in_pipeline(eval_data):
    """The checkpointed model as a pipeline FilterNode (the NMS-decoded
    inference filter of SURVEY.md §7 / VERDICT item 8)."""
    from nubomedia_vca_tpu.pipeline.graph import FilterNode, VcaPipeline

    scenes, t_boxes, t_valid, _, _ = eval_data
    # pick a scene the teacher found at least one face in
    idx = int(np.argmax(t_valid.sum(axis=1)))
    pipe = VcaPipeline().add(FilterNode(
        "face", cnn.CnnFaceDetector((distill.W, distill.H)), "face",
        emits=("face",)))
    events = pipe.process(scenes[idx][None])
    dets = events["face"][0].detections
    assert len(dets) >= 1
    assert all(d.type == "face" and d.width > 0 for d in dets)
