"""Overlay rendering — batched, jittable replacement for the reference's
in-place OpenCV drawing (rectangles `BaseFace.cpp:70-82`, circles
`kmseyedetect.cpp:1071-1100`, costume-image alpha blending
`kmsfacedetect.cpp:347-502`).

All functions take fixed-capacity box sets (boxes [B,K,4] + valid [B,K]) and
render with broadcast masks — no data-dependent shapes, O(K·H·W) vector ops
on the VPU.

Each device function has a `*_np` host twin producing BIT-IDENTICAL pixels
(asserted in tests): the serving loop's detect-downscaled mode keeps only
work-resolution luma on device and draws on the retained full-resolution
color frame host-side (the reference also detects on a downscaled copy and
draws on the original CPU-side, kmsfacedetect.cpp:805,832-850). The host
twins write only each box's clipped neighborhood — O(K·box) numpy work,
not O(K·H·W) — which is exact because the device masks are false outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _grid(h, w):
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ys, xs


def draw_rectangles(img, boxes, valid, color=(0, 255, 0), thickness=2):
    """img [B,H,W] or [B,H,W,C] uint8; boxes [B,K,4] int32; valid [B,K]."""
    gray = img.ndim == 3
    if gray:
        img = img[..., None]
    B, H, W, C = img.shape
    ys, xs = _grid(H, W)
    col = jnp.asarray(color[:C], jnp.uint8)
    t = thickness

    def per_frame(frame, bxs, val):
        def body(i, acc):
            x, y, w, h = bxs[i, 0], bxs[i, 1], bxs[i, 2], bxs[i, 3]
            inside_outer = ((xs >= x - t) & (xs <= x + w + t)
                            & (ys >= y - t) & (ys <= y + h + t))
            inside_inner = ((xs >= x + t) & (xs <= x + w - t)
                            & (ys >= y + t) & (ys <= y + h - t))
            border = inside_outer & ~inside_inner & val[i]
            return jnp.where(border[..., None], col, acc)

        return jax.lax.fori_loop(0, bxs.shape[0], body, frame)

    out = jax.vmap(per_frame)(img, boxes, valid)
    return out[..., 0] if gray else out


def draw_circles(img, boxes, valid, color=(0, 255, 0), thickness=2):
    """Circles inscribed in the boxes (the eye detector draws circles,
    kmseyedetect.cpp:1071-1100)."""
    gray = img.ndim == 3
    if gray:
        img = img[..., None]
    B, H, W, C = img.shape
    ys, xs = _grid(H, W)
    col = jnp.asarray(color[:C], jnp.uint8)

    def per_frame(frame, bxs, val):
        def body(i, acc):
            x, y, w, h = bxs[i, 0], bxs[i, 1], bxs[i, 2], bxs[i, 3]
            cx, cy = x + w // 2, y + h // 2
            r = jnp.maximum(w, h) // 2
            d2 = (xs - cx) ** 2 + (ys - cy) ** 2
            ring = (d2 <= (r + thickness) ** 2) & (d2 >= (r - thickness) ** 2)
            ring = ring & val[i]
            return jnp.where(ring[..., None], col, acc)

        return jax.lax.fori_loop(0, bxs.shape[0], body, frame)

    out = jax.vmap(per_frame)(img, boxes, valid)
    return out[..., 0] if gray else out


def blend_overlay_image(img, overlay_rgba, boxes, valid,
                        offset_x_percent=0.0, offset_y_percent=0.0,
                        width_percent=1.0, height_percent=1.0):
    """Alpha-blend a costume image over each detection, scaled and offset
    relative to the box like setOverlayedImage (kmsfacedetect.cpp:427-502).

    img [B,H,W,3] uint8; overlay_rgba [h,w,4] uint8 (alpha 0..255).
    The overlay is resampled per box by nearest lookup into its texture.
    """
    B, H, W, C = img.shape
    oh, ow = overlay_rgba.shape[:2]
    ys, xs = _grid(H, W)
    ov = overlay_rgba.astype(jnp.float32)

    def per_frame(frame, bxs, val):
        def body(i, acc):
            x, y, w, h = bxs[i, 0], bxs[i, 1], bxs[i, 2], bxs[i, 3]
            dx = x + (offset_x_percent * w).astype(jnp.int32)
            dy = y + (offset_y_percent * h).astype(jnp.int32)
            dw = jnp.maximum((width_percent * w).astype(jnp.int32), 1)
            dh = jnp.maximum((height_percent * h).astype(jnp.int32), 1)
            inside = (xs >= dx) & (xs < dx + dw) & (ys >= dy) & (ys < dy + dh)
            # texture coordinates (nearest)
            u = jnp.clip(((xs - dx) * ow) // jnp.maximum(dw, 1), 0, ow - 1)
            v = jnp.clip(((ys - dy) * oh) // jnp.maximum(dh, 1), 0, oh - 1)
            texel = ov[v, u]                      # [H,W,4]
            alpha = (texel[..., 3:4] / 255.0) * inside[..., None] * val[i]
            rgb = texel[..., :3]
            return acc * (1 - alpha) + rgb * alpha

        out = jax.lax.fori_loop(0, bxs.shape[0], body,
                                frame.astype(jnp.float32))
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    return jax.vmap(per_frame)(img, boxes, valid)


# ---------------------------------------------------------------- host twins
# Bit-identical numpy implementations for the serving loop's host-side draw
# (detect-downscaled + annotate-full-res). Same box iteration order (later
# boxes overwrite earlier), same masks, same integer/float arithmetic.

def draw_rectangles_np(img, boxes, valid, color=(0, 255, 0), thickness=2):
    """Host twin of draw_rectangles: writes only each box's clipped border
    neighborhood. img [B,H,W] or [B,H,W,C] uint8 (copied, not mutated)."""
    gray = img.ndim == 3
    if gray:
        img = img[..., None]
    img = np.array(img, np.uint8, copy=True)
    B, H, W, C = img.shape
    col = np.asarray(color[:C], np.uint8)
    t = thickness
    for b in range(B):
        for i in range(boxes.shape[1]):
            if not valid[b, i]:
                continue
            x, y, w, h = (int(v) for v in boxes[b, i])
            y0, y1 = max(y - t, 0), min(y + h + t + 1, H)
            x0, x1 = max(x - t, 0), min(x + w + t + 1, W)
            if y0 >= y1 or x0 >= x1:
                continue
            ys = np.arange(y0, y1)[:, None]
            xs = np.arange(x0, x1)[None, :]
            inner = ((xs >= x + t) & (xs <= x + w - t)
                     & (ys >= y + t) & (ys <= y + h - t))
            img[b, y0:y1, x0:x1][~inner] = col
    return img[..., 0] if gray else img


def draw_circles_np(img, boxes, valid, color=(0, 255, 0), thickness=2):
    """Host twin of draw_circles (ring inscribed in each box)."""
    gray = img.ndim == 3
    if gray:
        img = img[..., None]
    img = np.array(img, np.uint8, copy=True)
    B, H, W, C = img.shape
    col = np.asarray(color[:C], np.uint8)
    t = thickness
    for b in range(B):
        for i in range(boxes.shape[1]):
            if not valid[b, i]:
                continue
            x, y, w, h = (int(v) for v in boxes[b, i])
            cx, cy = x + w // 2, y + h // 2
            r = max(w, h) // 2
            y0, y1 = max(cy - r - t, 0), min(cy + r + t + 1, H)
            x0, x1 = max(cx - r - t, 0), min(cx + r + t + 1, W)
            if y0 >= y1 or x0 >= x1:
                continue
            ys = np.arange(y0, y1)[:, None]
            xs = np.arange(x0, x1)[None, :]
            d2 = (xs - cx) ** 2 + (ys - cy) ** 2
            ring = (d2 <= (r + t) ** 2) & (d2 >= (r - t) ** 2)
            img[b, y0:y1, x0:x1][ring] = col
    return img[..., 0] if gray else img


def blend_overlay_image_np(img, overlay_rgba, boxes, valid,
                           offset_x_percent=0.0, offset_y_percent=0.0,
                           width_percent=1.0, height_percent=1.0):
    """Host twin of blend_overlay_image: float32 accumulation per frame,
    one round+clip at the end, identical texture-coordinate arithmetic."""
    B, H, W, C = img.shape
    oh, ow = overlay_rgba.shape[:2]
    ov = overlay_rgba.astype(np.float32)
    out = np.empty_like(img)
    for b in range(B):
        acc = img[b].astype(np.float32)
        for i in range(boxes.shape[1]):
            if not valid[b, i]:
                continue
            x, y, w, h = (int(v) for v in boxes[b, i])
            dx = x + int(np.float32(offset_x_percent) * np.float32(w))
            dy = y + int(np.float32(offset_y_percent) * np.float32(h))
            dw = max(int(np.float32(width_percent) * np.float32(w)), 1)
            dh = max(int(np.float32(height_percent) * np.float32(h)), 1)
            y0, y1 = max(dy, 0), min(dy + dh, H)
            x0, x1 = max(dx, 0), min(dx + dw, W)
            if y0 >= y1 or x0 >= x1:
                continue
            ys = np.arange(y0, y1)[:, None]
            xs = np.arange(x0, x1)[None, :]
            u = np.clip(((xs - dx) * ow) // max(dw, 1), 0, ow - 1)
            v = np.clip(((ys - dy) * oh) // max(dh, 1), 0, oh - 1)
            texel = ov[v, u]                              # [y1-y0,x1-x0,4]
            alpha = texel[..., 3:4] / np.float32(255.0)
            rgb = texel[..., :3]
            win = acc[y0:y1, x0:x1]
            acc[y0:y1, x0:x1] = win * (1 - alpha) + rgb * alpha
        out[b] = np.clip(np.round(acc), 0, 255).astype(np.uint8)
    return out
