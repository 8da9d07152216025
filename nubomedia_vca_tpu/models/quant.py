"""Int8 serving variant of the learned detector.

Weights are quantized offline (per-output-channel symmetric int8);
activations are quantized dynamically per layer (per-tensor abs-max, the
fused Pallas kernel `ops/pallas/quant_pallas.py` on TPU). Convolutions and
the head matmuls then run int8×int8→int32 — the MXU's highest-throughput
mode (4x the bf16 rate on v5e) — and dequantize into f32 with the two
scales.

The reference has nothing like this (fixed 2001-era cascades on CPU,
SURVEY.md §2); it exists because a production TPU deployment of the
learned detector family wants the int8 serving path. Accuracy is gated in
tests/test_quant.py against the shipped f32 checkpoint's teacher labels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.quant_pallas import quantize_int8_pallas, quantize_int8_xla
from . import cnn


def _quant_weight_per_cout(w: jnp.ndarray, cout_axis: int):
    """Per-output-channel symmetric int8 weight quantization."""
    w = jnp.asarray(w)
    red = tuple(a for a in range(w.ndim) if a != cout_axis)
    abs_max = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    scale = jnp.maximum(abs_max, 1e-8) / 127.0
    q = jnp.clip(jnp.rint(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_params(params: dict) -> dict:
    """f32 checkpoint params → int8 weights + scales (biases stay f32)."""
    out = {}
    for i in range(4):
        w = params[f"conv{i}"]["w"]          # [3,3,cin,cout]
        q, s = _quant_weight_per_cout(w, 3)
        out[f"conv{i}"] = {"w_q": q, "w_s": s, "b": params[f"conv{i}"]["b"]}
    if "ctx" in params:                      # dilated context conv
        q, s = _quant_weight_per_cout(params["ctx"]["w"], 3)
        out["ctx"] = {"w_q": q, "w_s": s, "b": params["ctx"]["b"]}
    for name, cout_axis in (("head1", 1), ("head2", 1)):
        w = params[name]["w"]
        q, s = _quant_weight_per_cout(w, cout_axis)
        out[name] = {"w_q": q, "w_s": s, "b": params[name]["b"]}
    return out


def _act_quant(x):
    """Dynamic per-tensor activation quantization (Pallas on TPU)."""
    if jax.default_backend() == "tpu":
        return quantize_int8_pallas(x)
    return quantize_int8_xla(x)


def forward_int8(qparams: dict, gray: jnp.ndarray) -> jnp.ndarray:
    """gray [B,H,W] uint8 → [B,H/16,W/16,5], int8 compute path.

    Mirrors cnn.forward (same architecture, cites its layer layout); every
    conv/matmul runs int8xint8→int32 with f32 dequant."""
    x = (gray.astype(jnp.float32) / 128.0 - 1.0)[..., None]
    for i in range(4):
        lw = qparams[f"conv{i}"]
        xq, xs = _act_quant(x)
        y = jax.lax.conv_general_dilated(
            xq.astype(jnp.int8), lw["w_q"],
            window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        scale = xs * lw["w_s"].reshape(1, 1, 1, -1)
        x = jax.nn.relu(y.astype(jnp.float32) * scale + lw["b"])
    if "ctx" in qparams:                     # residual dilated context conv
        lw = qparams["ctx"]
        xq, xs = _act_quant(x)
        y = jax.lax.conv_general_dilated(
            xq.astype(jnp.int8), lw["w_q"],
            window_strides=(1, 1), padding="SAME",
            rhs_dilation=(cnn.CTX_DILATION, cnn.CTX_DILATION),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        scale = xs * lw["w_s"].reshape(1, 1, 1, -1)
        x = x + jax.nn.relu(y.astype(jnp.float32) * scale + lw["b"])
    h1 = qparams["head1"]
    xq, xs = _act_quant(x)
    h = jnp.einsum("bhwc,cd->bhwd", xq.astype(jnp.int8), h1["w_q"],
                   preferred_element_type=jnp.int32)
    h = jax.nn.relu(h.astype(jnp.float32) * (xs * h1["w_s"].reshape(1, 1, 1, -1))
                    + h1["b"])
    h2 = qparams["head2"]
    hq, hs = _act_quant(h)
    out = jnp.einsum("bhwd,de->bhwe", hq.astype(jnp.int8), h2["w_q"],
                     preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * (hs * h2["w_s"].reshape(1, 1, 1, -1)) \
        + h2["b"]


class QuantizedCnnFaceDetector(cnn.CnnFaceDetector):
    """Drop-in int8 variant: same process()/detect_boxes() surface as
    CnnFaceDetector, device path = forward_int8 over quantized params."""

    def __init__(self, frame_size, params=None, checkpoint=None,
                 threshold: float | None = None, n_streams: int = 1,
                 multi_scale: bool = False, detect_event: int = 0,
                 process_x_every_4_frames: int = 4):
        super().__init__(frame_size, params=params, checkpoint=checkpoint,
                         threshold=threshold, n_streams=n_streams,
                         multi_scale=multi_scale, detect_event=detect_event,
                         process_x_every_4_frames=process_x_every_4_frames)
        self.qparams = quantize_params(self.params)
        self._rejit()

    def _rejit(self):
        # guarded: the base __init__ calls _rejit before qparams exists
        if hasattr(self, "qparams"):
            self._detect_jit = jax.jit(self._device_detect_int8)

    def _device_detect_int8(self, gray):
        return self._multi_detect(
            gray, lambda w: forward_int8(self.qparams, w))


def size_report(params: dict) -> dict:
    """Bytes of f32 vs int8 parameter storage (weights only)."""
    f32 = sum(np.asarray(params[k]["w"]).nbytes
              for k in params if "w" in params[k])
    qp = quantize_params(params)
    q = sum(np.asarray(qp[k]["w_q"]).nbytes + np.asarray(qp[k]["w_s"]).nbytes
            for k in qp)
    return {"f32_bytes": int(f32), "int8_bytes": int(q),
            "ratio": round(f32 / max(q, 1), 2)}
