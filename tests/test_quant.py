"""Int8 serving variant: quantizer parity + end-to-end accuracy gates."""

import numpy as np
import jax.numpy as jnp
import pytest

from nubomedia_vca_tpu.models import cnn, distill, quant
from nubomedia_vca_tpu.ops.pallas.quant_pallas import (
    quantize_int8_pallas, quantize_int8_xla,
)


def test_pallas_quantizer_matches_xla(rng):
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32)) * 3.7
    v_p, s_p = quantize_int8_pallas(x, interpret=True)
    v_x, s_x = quantize_int8_xla(x)
    assert float(s_p) == pytest.approx(float(s_x), rel=1e-6)
    assert np.array_equal(np.asarray(v_p), np.asarray(v_x))


def test_weight_quantization_roundtrip():
    params = cnn.load_params_npz(cnn.find_checkpoint())
    qp = quant.quantize_params(params)
    # dequantized weights within one quantization step of the originals
    for i in range(4):
        w = np.asarray(params[f"conv{i}"]["w"])
        deq = (np.asarray(qp[f"conv{i}"]["w_q"], np.float32)
               * np.asarray(qp[f"conv{i}"]["w_s"]))
        step = np.asarray(qp[f"conv{i}"]["w_s"])
        assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-8)
    rep = quant.size_report(params)
    assert rep["ratio"] > 3.5  # ~4x smaller weights


def test_int8_detector_accuracy_vs_teacher():
    """The int8 path keeps the f32 checkpoint's detection quality
    (recall/precision vs the frozen teacher labels; gates slightly looser
    than tests/test_cnn_checkpoint.py's f32 gates)."""
    import os

    d = np.load(os.path.join(os.path.dirname(__file__), "data",
                             "cnn_eval_labels.npz"))
    rng = np.random.RandomState(int(d["seed"]))
    scenes = np.stack([distill.make_scene(rng) for _ in range(int(d["n"]))])
    det = quant.QuantizedCnnFaceDetector((distill.W, distill.H))
    s_boxes = det.detect_boxes(scenes)

    def iou(a, b):
        ax1, ay1 = a[0] + a[2], a[1] + a[3]
        bx1, by1 = b[0] + b[2], b[1] + b[3]
        iw = max(0.0, min(ax1, bx1) - max(a[0], b[0]))
        ih = max(0.0, min(ay1, by1) - max(a[1], b[1]))
        inter = iw * ih
        return inter / max(a[2] * a[3] + b[2] * b[3] - inter, 1e-9)

    tp = fn = fp = 0
    for i in range(int(d["n"])):
        teach = [d["boxes"][i, j] for j in range(d["boxes"].shape[1])
                 if d["valid"][i, j]]
        ign = [d["ignore"][i, j] for j in range(d["ignore"].shape[1])
               if d["ignore_valid"][i, j]]
        stud = list(s_boxes[i])
        used = set()
        for t in teach:
            best, best_iou = None, 0.5
            for k, s in enumerate(stud):
                if k in used:
                    continue
                v = iou(t, s)
                if v >= best_iou:
                    best, best_iou = k, v
            if best is None:
                fn += 1
            else:
                tp += 1
                used.add(best)
        for k, s in enumerate(stud):
            # boxes on teacher-missed drawn faces are neither TP nor FP
            if k not in used and not any(iou(g, s) >= 0.3 for g in ign):
                fp += 1
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    assert recall >= 0.90, (recall, precision, tp, fn, fp)
    assert precision >= 0.80, (recall, precision, tp, fn, fp)
