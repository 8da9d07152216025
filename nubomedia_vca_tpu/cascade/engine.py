"""Multiscale Haar-cascade detection engine — the TPU replacement for
``cv::CascadeClassifier::detectMultiScale`` (the reference's hot loop,
``kmsfacedetect.cpp:809-811``, ~95% of its cycles per SURVEY.md §3.2).

Design (TPU-first, not a port):

* Pyramid/grid geometry is host-precomputed (`pyramid.compute_levels`) so every
  shape is static under `jit`.
* Per level, evaluation proceeds in **blocks of stages** with compaction
  between blocks — the static-shape equivalent of OpenCV's data-dependent
  early-exit loop:

  - **Block 0 (dense)**: the first few stages are evaluated for *every*
    window position as strided-slice arithmetic over the integral images —
    pure vectorized adds on the VPU, no gathers. Kills most windows.

  - **Compaction**: surviving windows are compacted to a static per-level
    capacity with `top_k` (earliest-index-first). A per-frame overflow flag
    reports if survivors ever exceeded capacity.

  - **Matmul blocks (MXU)**: for survivors, a (h0+1)×(w0+1) integral patch is
    gathered once per window and made *doubly-relative* (subtract first
    row/column: every entry becomes a window-local region sum ≤ 20·20·255,
    making the whole evaluation exactly representable in float32). Each
    block's feature values are one patch×feature-matrix matmul on the MXU;
    weak trees are branch-free selects; stage sums a second small matmul.
    Between blocks the survivor set is re-compacted (cheap row gather of the
    already-loaded patches), so late expensive stages run on few windows.

* Numeric semantics match OpenCV 4.6 exactly where integer (integral images,
  rect sums, INTER_LINEAR_EXACT resize, rounding) and to float32 rounding
  elsewhere (variance normalization, stage sums). Parity is enforced by tests
  against the C++ golden tool (tests/golden).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.integral import (
    integral_image,
    sq_integral_image,
    tilted_integral_image,
)
from ..ops.resize import resize_linear_exact
from ..ops.grouping import group_rectangles_jax, group_rectangles_np
from .pyramid import LevelSpec, compute_levels
from .xml_loader import HaarCascade


def _sum_corner_offsets(x, y, w, h):
    """Axis-aligned rect → 4 (dy, dx, sign) corners on the sum table."""
    return [(y, x, 1), (y, x + w, -1), (y + h, x, -1), (y + h, x + w, 1)]


def _tilt_corner_offsets(x, y, w, h):
    """Tilted rect → 4 (dy, dx, sign) corners on the tilted table.

    sum = T[y,x] - T[y+w,x+w] - T[y+h,x-h] + T[y+w+h,x+w-h]
    (verified against cv::integral's tilted output; see tests).
    """
    return [
        (y, x, 1),
        (y + w, x + w, -1),
        (y + h, x - h, -1),
        (y + w + h, x + w - h, 1),
    ]


@dataclasses.dataclass
class _Block:
    """Host-precomputed tables for one matmul block of stages."""

    w_sum: np.ndarray          # [PP, Fb] f32
    w_tilt: np.ndarray | None  # [PP, Fb] f32
    feat0: np.ndarray          # [Wb] i32 (block-local feature ids)
    thr0: np.ndarray
    featL: np.ndarray
    thrL: np.ndarray
    leavesL: np.ndarray        # [Wb, 2]
    featR: np.ndarray
    thrR: np.ndarray
    leavesR: np.ndarray
    stage_onehot: np.ndarray   # [Wb, Sb] f32
    stage_thr: np.ndarray      # [Sb] f32
    cap_frac: float            # capacity fraction of level windows


class CascadeEngine:
    """Batched multiscale detector for one cascade at one static image size.

    Produces raw candidate windows (pre-grouping) with OpenCV-parity
    coordinates; `detect()` adds exact minNeighbors grouping on host.
    """

    def __init__(
        self,
        cascade: HaarCascade,
        image_size: tuple[int, int],           # (W, H)
        scale_factor: float = 1.25,
        min_size: tuple[int, int] = (0, 0),
        max_size: tuple[int, int] = (0, 0),
        dense_stages: int | None = None,
        block_plan: list[tuple[int, float]] | None = None,
        max_capacity: int = 32768,
        use_pallas_integral: bool | None = None,
        use_pallas_dense: bool | None = None,
        use_pallas_pyramid: bool | None = None,
    ):
        """block_plan: list of (n_stages, capacity_frac) for matmul blocks;
        the last entry's n_stages may exceed what remains (clamped). The
        default plan is tuned so pathological low-contrast frames still fit:
        dense 3 stages → (5 stages, 45%) → (rest, 8%)."""
        self.cascade = cascade
        self.image_w, self.image_h = image_size
        self.scale_factor = scale_factor
        self.levels: list[LevelSpec] = compute_levels(
            self.image_w, self.image_h, cascade.window_w, cascade.window_h,
            scale_factor, min_size, max_size,
        )
        if not self.levels:
            raise ValueError("image smaller than cascade window")

        counts = cascade.stage_weak_counts()
        cum = np.cumsum(counts)
        if dense_stages is None:
            # first stages with cumulative weak count <= 48 (at least 1)
            dense_stages = max(1, int(np.searchsorted(cum, 48, side="right")))
        self.n_dense_stages = min(dense_stages, cascade.n_stages)
        if block_plan is None:
            block_plan = [(5, 0.45), (cascade.n_stages, 0.08)]
        self._max_capacity = max_capacity

        if use_pallas_integral is None:
            # measured on the v5e chip (batch 64, 160x120 face engine, async
            # steady state): fused Pallas integral+sq kernel vs XLA cumsum —
            # see bench.py config "device_path"; default on for TPU.
            use_pallas_integral = jax.default_backend() == "tpu"
        self._use_pallas_integral = use_pallas_integral

        self._build_tables(block_plan)
        if use_pallas_dense is None:
            # fused integral+sq+norm+dense kernel (ops/pallas/dense_pallas):
            # one VMEM residency per frame/level, iisq never materialized in
            # HBM. In matched fresh-process comparisons on the v5e chip it
            # measured <= the XLA dense phase at B=64 and B=256 (23.5 vs
            # 26.1 us/batch, 17.4 vs 22.2; tunnel-harness enqueue timings —
            # see tools/profile_breakdown.py); window sets are identical
            # (tests/test_pallas_ops.py). Tilted cascades run the fused
            # path too (skewed-prefix-sum RSAT in-kernel, emitted for the
            # patch gather), gated at a smaller level size.
            use_pallas_dense = jax.default_backend() == "tpu"
        self._use_pallas_dense = use_pallas_dense
        if use_pallas_pyramid is None:
            # all-levels fused pyramid kernel (resize+integral+dense for
            # every single-block level, work image read from HBM once);
            # non-tilted cascades only — see build_pyramid_dense_phase
            use_pallas_pyramid = self._use_pallas_dense
        self._use_pallas_pyramid = use_pallas_pyramid
        self._pyramid_kernels: dict = {}
        self._dense_kernels: dict = {}
        self._detect_jit = jax.jit(self._detect_impl)
        # fine scale factors produce very deep pyramids whose whole-program
        # graphs choke the TPU remote compiler — default those to per-level
        self._force_per_level = len(self.levels) > 20
        # On the TPU harness every extra PROGRAM costs a remote-compiler
        # round-trip plus an executable load through the tunnel (seconds
        # each): a tilted sf=1.1 part engine is 24 SOLO levels (tilted
        # cascades get no pyramid-kernel chunks) and three of them made the
        # full-chain warm the bench's long pole. Solo XLA levels are
        # therefore grouped into multi-level programs on TPU — well under
        # the >20-level whole-pyramid size that chokes the remote compiler.
        # CPU keeps one program per level: the test suite's persistent
        # XLA:CPU cache stays valid and individual compiles stay small.
        self._xla_group_levels = max(1, int(os.environ.get(
            "VCA_XLA_GROUP_LEVELS",
            "6" if jax.default_backend() == "tpu" else "1")))

    # ------------------------------------------------------------------ prep
    def _build_tables(self, block_plan) -> None:
        c = self.cascade
        w0, h0 = c.window_w, c.window_h
        self._pw, self._ph = w0 + 1, h0 + 1
        nw, nh = w0 - 2, h0 - 2
        self._norm_area = float(nw * nh)
        self._norm_corners = _sum_corner_offsets(1, 1, nw, nh)

        # per-feature corner decomposition
        self._feat_rects = []
        for f in range(c.n_features):
            rects = []
            for r in range(c.rects.shape[1]):
                wgt = float(c.rect_weights[f, r])
                if wgt == 0.0:
                    continue
                x, y, w, h = (int(v) for v in c.rects[f, r])
                corners = (_tilt_corner_offsets(x, y, w, h) if c.tilted[f]
                           else _sum_corner_offsets(x, y, w, h))
                rects.append(("tilt" if c.tilted[f] else "sum", corners, wgt))
            self._feat_rects.append(rects)

        counts = c.stage_weak_counts()
        cum = np.concatenate([[0], np.cumsum(counts)])

        # dense block
        nd = self.n_dense_stages
        split = int(cum[nd])
        self._dense = dict(
            feat0=c.feat0[:split], thr0=c.thr0[:split],
            featL=c.featL[:split], thrL=c.thrL[:split], leavesL=c.leavesL[:split],
            featR=c.featR[:split], thrR=c.thrR[:split], leavesR=c.leavesR[:split],
            stage=c.weak_stage[:split],
            stage_thr=c.stage_thresholds[:nd],
        )
        self._dense_uses_tilt = bool(c.tilted[
            np.unique(np.concatenate([c.feat0[:split], c.featL[:split],
                                      c.featR[:split]]))
        ].any()) if split else False

        # matmul blocks
        self._blocks: list[_Block] = []
        s_lo = nd
        for n_stages, frac in block_plan:
            s_hi = min(s_lo + n_stages, c.n_stages)
            if s_hi <= s_lo:
                continue
            w_lo, w_hi = int(cum[s_lo]), int(cum[s_hi])
            self._blocks.append(self._make_block(w_lo, w_hi, s_lo, s_hi, frac))
            s_lo = s_hi
        if s_lo < c.n_stages:
            w_lo, w_hi = int(cum[s_lo]), int(cum[c.n_stages])
            self._blocks.append(
                self._make_block(w_lo, w_hi, s_lo, c.n_stages,
                                 block_plan[-1][1]))

        # per-level capacities for each block
        self._level_caps: list[list[int]] = []
        for l in self.levels:
            caps = []
            prev = l.n_windows
            for blk in self._blocks:
                cap = int(min(prev, self._max_capacity,
                              max(64, int(np.ceil(l.n_windows * blk.cap_frac)))))
                caps.append(cap)
                prev = cap
            self._level_caps.append(caps)
        self.total_capacity = sum(
            caps[-1] if caps else l.n_windows
            for caps, l in zip(self._level_caps, self.levels)
        )

        # original-pixel coordinate maps
        self._maps = []
        for l in self.levels:
            xs = (np.arange(l.nx) * l.ystep).astype(np.float64)
            ys = (np.arange(l.ny) * l.ystep).astype(np.float64)
            self._maps.append((
                np.rint(xs * l.factor).astype(np.int32),
                np.rint(ys * l.factor).astype(np.int32),
            ))

        dy, dx = np.meshgrid(np.arange(self._ph), np.arange(self._pw),
                             indexing="ij")
        self._patch_dy = dy.reshape(-1)
        self._patch_dx = dx.reshape(-1)
        # survivor patches can equally be gathered from the LEVEL IMAGE
        # (uint8, w0×h0) instead of the integral table: the doubly-relative
        # normalization of an ii patch IS the patch-local integral image,
        # so cumsum-ing the gathered pixels reproduces it entry-for-entry
        # (int32 wraparound, < 2^24 → identical f32). The fused dense
        # kernel then never has to emit ii to HBM (non-tilted cascades).
        dyi, dxi = np.meshgrid(np.arange(self._ph - 1),
                               np.arange(self._pw - 1), indexing="ij")
        self._img_patch_dy = dyi.reshape(-1)
        self._img_patch_dx = dxi.reshape(-1)
        self._uses_tilt = bool(c.has_tilted)

    def _make_block(self, w_lo, w_hi, s_lo, s_hi, frac) -> _Block:
        c = self.cascade
        used = sorted(
            {int(f) for f in np.concatenate(
                [c.feat0[w_lo:w_hi], c.featL[w_lo:w_hi], c.featR[w_lo:w_hi]])}
        )
        remap = {f: i for i, f in enumerate(used)}
        PP = self._pw * self._ph
        w_sum = np.zeros((PP, len(used)), np.float32)
        w_tilt = np.zeros((PP, len(used)), np.float32) if c.has_tilted else None
        for f in used:
            i = remap[f]
            for table, corners, wgt in self._feat_rects[f]:
                tgt = w_sum if table == "sum" else w_tilt
                for (dy, dx, s) in corners:
                    assert 0 <= dy < self._ph and 0 <= dx < self._pw
                    tgt[dy * self._pw + dx, i] += s * wgt
        if w_tilt is not None and not w_tilt.any():
            w_tilt = None
        onehot = np.zeros((w_hi - w_lo, s_hi - s_lo), np.float32)
        for i, s in enumerate(c.weak_stage[w_lo:w_hi]):
            onehot[i, int(s) - s_lo] = 1.0
        rm = np.vectorize(lambda f: remap[int(f)], otypes=[np.int32])
        return _Block(
            w_sum=w_sum, w_tilt=w_tilt,
            feat0=rm(c.feat0[w_lo:w_hi]), thr0=c.thr0[w_lo:w_hi],
            featL=rm(c.featL[w_lo:w_hi]), thrL=c.thrL[w_lo:w_hi],
            leavesL=c.leavesL[w_lo:w_hi],
            featR=rm(c.featR[w_lo:w_hi]), thrR=c.thrR[w_lo:w_hi],
            leavesR=c.leavesR[w_lo:w_hi],
            stage_onehot=onehot,
            stage_thr=c.stage_thresholds[s_lo:s_hi],
            cap_frac=frac,
        )

    # ------------------------------------------------------------- dense ops
    @staticmethod
    def _slice(tab, dy, dx, ny, nx, step):
        return jax.lax.slice(
            tab,
            (0, dy, dx),
            (tab.shape[0], dy + (ny - 1) * step + 1, dx + (nx - 1) * step + 1),
            (1, step, step),
        )

    def _dense_rect_sum(self, tab, corners, ny, nx, step, corner_cache=None,
                        table_key=None):
        acc = None
        for (dy, dx, s) in corners:
            if corner_cache is not None:
                key = (table_key, dy, dx)
                v = corner_cache.get(key)
                if v is None:
                    v = self._slice(tab, dy, dx, ny, nx, step)
                    corner_cache[key] = v
            else:
                v = self._slice(tab, dy, dx, ny, nx, step)
            if acc is None:
                acc = v if s > 0 else -v
            else:
                acc = acc + v if s > 0 else acc - v
        return acc  # int32, exact

    def _dense_feature(self, ii, iit, fid, ny, nx, step, cache):
        """cache holds both per-feature values (int keys) and per-corner
        slices (tuple keys) — Haar features share corners heavily, so the
        corner cache shrinks the traced graph substantially."""
        if fid in cache:
            return cache[fid]
        val = None
        for table, corners, wgt in self._feat_rects[fid]:
            tab = ii if table == "sum" else iit
            rs = self._dense_rect_sum(
                tab, corners, ny, nx, step,
                corner_cache=cache, table_key=table).astype(jnp.float32)
            term = rs * jnp.float32(wgt)
            val = term if val is None else val + term
        cache[fid] = val
        return val

    @staticmethod
    def _weak_tree(v0, vL, vR, thr0, thrL, thrR, leavesL, leavesR):
        lv = jnp.where(vL < thrL, leavesL[..., 0], leavesL[..., 1])
        rv = jnp.where(vR < thrR, leavesR[..., 0], leavesR[..., 1])
        return jnp.where(v0 < thr0, lv, rv)

    @staticmethod
    def _compact(keys_src_alive, cap):
        """alive [B, N] bool → (sel [B, cap] indices asc, sel_alive, count)."""
        B, N = keys_src_alive.shape
        keys = jnp.where(keys_src_alive,
                         jnp.arange(N, 0, -1, dtype=jnp.int32), 0)
        k = min(cap, N)
        _, sel = jax.lax.top_k(keys, k)
        sel_alive = jnp.take_along_axis(keys_src_alive, sel, axis=1)
        count = jnp.sum(keys_src_alive, axis=1)
        return sel, sel_alive, count

    def _block_eval(self, blk: _Block, patch, patch_t, vnf_sel):
        """patch [B,C,PP] f32 (doubly-relative), vnf_sel [B,C] → pass [B,C].

        Precision.HIGHEST is mandatory: TPU matmuls default to bf16 on the
        MXU, which rounds the exact integral-patch values (up to ~1e5) by
        hundreds and destroys cascade parity. HIGHEST synthesizes true-f32
        products, keeping the evaluation exact (inputs are exact ints).
        """
        hi = jax.lax.Precision.HIGHEST
        feats = jnp.matmul(patch, blk.w_sum, precision=hi)
        if blk.w_tilt is not None:
            feats = feats + jnp.matmul(patch_t, blk.w_tilt, precision=hi)
        vals = feats * vnf_sel[:, :, None]
        v0 = jnp.take(vals, blk.feat0, axis=2)
        vL = jnp.take(vals, blk.featL, axis=2)
        vR = jnp.take(vals, blk.featR, axis=2)
        wout = self._weak_tree(v0, vL, vR, blk.thr0, blk.thrL, blk.thrR,
                               blk.leavesL, blk.leavesR)
        ssums = jnp.matmul(wout, blk.stage_onehot, precision=hi)
        return jnp.all(ssums >= blk.stage_thr, axis=-1)

    # ---------------------------------------------------------------- detect
    def _pyramid_chunks(self) -> tuple[tuple[int, ...], ...]:
        """Chunks of consecutive levels covered by the fused pyramid kernel
        (one kernel per chunk, source image read once per chunk). A level
        must fit a single VMEM block; chunks are bounded by a
        total-elements budget (Mosaic allocates the kernel's live set on
        the VMEM stack; the per-level sections are sequential but the
        allocator is not guaranteed to fully reuse them). A chunk is kept
        only when it beats the XLA path's bytes — deep-pyramid tail levels
        are small enough that re-reading 2 source rows per output row per
        level costs less than one full source read."""
        if not self._use_pallas_pyramid or self._uses_tilt:
            return ()
        W, H = self.image_w, self.image_h
        chunks: list[tuple[int, ...]] = []
        cur: list[int] = []
        total = 0

        def flush():
            nonlocal cur, total
            if cur:
                xla_bytes = sum(2 * self.levels[li].sh * W
                                + self.levels[li].sw * self.levels[li].sh
                                for li in cur)
                if xla_bytes > W * H:
                    chunks.append(tuple(cur))
            cur, total = [], 0

        for li, l in enumerate(self.levels):
            elems = (l.sh + 1) * (l.sw + 1)
            if elems > self.PALLAS_DENSE_MAX_ELEMS:
                flush()
                continue
            if total + elems > self.PALLAS_PYRAMID_MAX_SUM_ELEMS:
                flush()
            cur.append(li)
            total += elems
        flush()
        return tuple(chunks)

    def _pyramid_level_indices(self) -> tuple[int, ...]:
        """All pyramid-kernel-covered levels (flattened chunks)."""
        return tuple(li for chunk in self._pyramid_chunks() for li in chunk)

    def _eval_chunk(self, gray, chunk: tuple[int, ...]):
        """Run one pyramid-kernel chunk → [(boxes, alive, ovf)] per level."""
        kern = self._pyramid_kernels.get(chunk)
        if kern is None:
            from ..ops.pallas.dense_pallas import build_pyramid_dense_phase
            kern = build_pyramid_dense_phase(self, chunk)
            self._pyramid_kernels[chunk] = kern
        outs = kern(gray)
        res = []
        for li in chunk:
            img_l, vnf, alive = outs[li]
            if img_l is None:            # unscaled level == the work image
                img_l = gray
            res.append(self._level_post(
                li, img_l, None, None, vnf, alive.astype(bool)))
        return res

    def _detect_impl(self, gray):
        """gray [B, H, W] uint8 → (boxes [B, TC, 4] i32, valid [B, TC] bool,
        overflow [B] bool)."""
        B = gray.shape[0]
        covered: dict[int, tuple[int, ...]] = {}
        for chunk in self._pyramid_chunks():
            for li in chunk:
                covered[li] = chunk
        out_boxes, out_valid = [], []
        overflow = jnp.zeros((B,), bool)
        for li in range(len(self.levels)):
            chunk = covered.get(li)
            if chunk is not None:
                if li != chunk[0]:
                    continue             # emitted with the chunk head
                results = self._eval_chunk(gray, chunk)
            else:
                results = [self._eval_level(gray, li)]
            for boxes, alive, ovf in results:
                out_boxes.append(boxes)
                out_valid.append(alive)
                overflow = overflow | ovf
        return (jnp.concatenate(out_boxes, axis=1),
                jnp.concatenate(out_valid, axis=1),
                overflow)

    # Mosaic allocates the dense kernel's whole live set on the VMEM stack;
    # measured ~250 B/grid-element for the face-alt dense block (a 241x321
    # level wanted 19.19M > the 16M limit). Non-tilted levels above this
    # size run the ROW-STRIP variant of the fused kernel (bit-identical —
    # rect corner sums are translation-invariant, see dense_strip_plan);
    # only levels too wide for even a minimal strip fall back to the XLA
    # dense phase. Tilted cascades additionally hold the RSAT skew buffers
    # ([sh+1, sw+3·sh+1] i32) and must emit globally-consistent ii/iit for
    # the patch gather, so they keep the single-block ceiling.
    PALLAS_DENSE_MAX_ELEMS = 48_000
    PALLAS_DENSE_MAX_ELEMS_TILT = 16_000
    # total-elements budget of the all-levels pyramid kernel (Mosaic's VMEM
    # stack allocation is not guaranteed to reuse the sequential per-level
    # sections; the sf=1.25 face pyramid at width 160 totals ~39k)
    PALLAS_PYRAMID_MAX_SUM_ELEMS = 64_000

    def _pallas_dense_fits(self, l) -> bool:
        if self._uses_tilt:
            return (l.sh + 1) * (l.sw + 1) <= self.PALLAS_DENSE_MAX_ELEMS_TILT
        if (l.sh + 1) * (l.sw + 1) <= self.PALLAS_DENSE_MAX_ELEMS:
            return True
        from ..ops.pallas.dense_pallas import dense_strip_plan
        return dense_strip_plan(l.sh, l.sw, self.cascade.window_h,
                                self.PALLAS_DENSE_MAX_ELEMS,
                                l.ystep) is not None

    def _eval_level(self, gray, li: int):
        """One pyramid level → (boxes [B,cap,4], alive [B,cap], ovf [B])."""
        d = self._dense
        l = self.levels[li]
        img = resize_linear_exact(gray, (l.sw, l.sh))
        ny, nx, step = l.ny, l.nx, l.ystep

        if self._use_pallas_dense and self._pallas_dense_fits(l):
            # fused kernel: integral + sq-integral + norm + dense stages
            # in one VMEM residency (iisq never reaches HBM); evaluation
            # runs at full density in VMEM but only the ystep-strided
            # [ny, nx] grid is emitted, so HBM map traffic drops 4x on
            # step-2 levels (exactly the largest pyramid levels).
            kern = self._dense_kernels.get((l.sh, l.sw, step))
            if kern is None:
                from ..ops.pallas.dense_pallas import build_dense_phase
                kern = build_dense_phase(self, l.sh, l.sw, step)
                self._dense_kernels[(l.sh, l.sw, step)] = kern
            ii, iit, vnf, alive = kern(img)
            alive = alive.astype(bool)
        else:
            if self._use_pallas_integral:
                # fused kernel: one VMEM pass produces both tables
                from ..ops.pallas.integral_pallas import (
                    integral_images_pallas)
                ii, iisq = integral_images_pallas(img)
            else:
                ii = integral_image(img)
                iisq = sq_integral_image(img)
            iit = (tilted_integral_image(img) if self._uses_tilt
                   else None)

            # variance normalization, dense
            valsum = self._dense_rect_sum(
                ii, self._norm_corners, ny, nx, step)
            sqv = self._dense_rect_sum(
                iisq, self._norm_corners, ny, nx, step)
            sq_u = jax.lax.bitcast_convert_type(sqv, jnp.uint32)
            vf = valsum.astype(jnp.float32)
            nf = self._norm_area * sq_u.astype(jnp.float32) - vf * vf
            # OpenCV 4.x rejects windows whose pixel stddev is <= 10,
            # i.e. nf <= 100*area^2 (empirically pinned against the
            # golden tool: sigma == 10.00 fails, 10.03 passes).
            win_valid = nf > 100.0 * self._norm_area * self._norm_area
            vnf = jnp.where(win_valid,
                            1.0 / jnp.sqrt(jnp.maximum(nf, 1e-20)), 1.0)

            # dense block
            cache: dict[int, jnp.ndarray] = {}
            alive = win_valid
            widx, n_d = 0, len(d["feat0"])
            for s_idx in range(self.n_dense_stages):
                ssum = jnp.zeros_like(vnf)
                while widx < n_d and d["stage"][widx] == s_idx:
                    f0 = self._dense_feature(
                        ii, iit, int(d["feat0"][widx]),
                        ny, nx, step, cache) * vnf
                    fL = self._dense_feature(
                        ii, iit, int(d["featL"][widx]),
                        ny, nx, step, cache) * vnf
                    fR = self._dense_feature(
                        ii, iit, int(d["featR"][widx]),
                        ny, nx, step, cache) * vnf
                    ssum = ssum + self._weak_tree(
                        f0, fL, fR, d["thr0"][widx], d["thrL"][widx],
                        d["thrR"][widx], d["leavesL"][widx],
                        d["leavesR"][widx])
                    widx += 1
                alive = alive & (ssum >= d["stage_thr"][s_idx])

        return self._level_post(li, img, ii, iit, vnf, alive)

    def _level_post(self, li, img, ii, iit, vnf, alive):
        """Strided dense-grid maps → level boxes: compaction, survivor
        patch gather, matmul blocks. `img` is the level image (used for
        the no-table gather when `ii` is None — including levels from the
        all-levels pyramid kernel, where the unscaled level passes the
        work image itself)."""
        l, caps = self.levels[li], self._level_caps[li]
        map_x, map_y = self._maps[li]
        B = alive.shape[0]
        ny, nx, step = l.ny, l.nx, l.ystep
        nwin = ny * nx
        overflow = jnp.zeros((B,), bool)
        alive_flat = alive.reshape(B, nwin)
        vnf_flat = vnf.reshape(B, nwin)

        if not self._blocks:
            # tiny cascades: no matmul blocks — emit dense survivors
            cap = min(nwin, self._max_capacity)
            sel, sel_alive, count = self._compact(alive_flat, cap)
            overflow = overflow | (count > cap)
            win_ids = sel
        else:
            # first compaction + one-time patch gather
            cap0 = caps[0]
            sel, sel_alive, count = self._compact(alive_flat, cap0)
            overflow = overflow | (count > cap0)
            win_ids = sel
            iy, ix = sel // nx, sel % nx
            y, x = iy * step, ix * step
            k0 = sel.shape[1]
            if ii is None:
                # fused-kernel path, no table in HBM: gather uint8
                # window pixels and rebuild the patch-local integral —
                # entry-for-entry identical to the doubly-relative ii
                # patch below (int32 wraparound; values < 2^24)
                base = y * l.sw + x
                poff = (self._img_patch_dy * l.sw
                        + self._img_patch_dx)[None, None, :]
                idx = base[:, :, None] + poff
                pimg = jnp.take_along_axis(
                    img.reshape(B, -1), idx.reshape(B, -1), axis=1
                ).reshape(B, k0, self._ph - 1, self._pw - 1)
                local = jnp.cumsum(
                    jnp.cumsum(pimg.astype(jnp.int32), axis=-1),
                    axis=-2)
                patch = jnp.pad(local,
                                ((0, 0), (0, 0), (1, 0), (1, 0)))
            else:
                sw1 = l.sw + 1
                base = y * sw1 + x
                poff = (self._patch_dy * sw1
                        + self._patch_dx)[None, None, :]
                idx = base[:, :, None] + poff
                patch = jnp.take_along_axis(
                    ii.reshape(B, -1), idx.reshape(B, -1), axis=1
                ).reshape(B, k0, self._ph, self._pw)
                patch = (patch - patch[:, :, :1, :]
                         - patch[:, :, :, :1] + patch[:, :, :1, :1])
            patch = patch.reshape(B, k0, -1).astype(jnp.float32)
            if self._uses_tilt:
                patch_t = jnp.take_along_axis(
                    iit.reshape(B, -1), idx.reshape(B, -1), axis=1
                ).reshape(B, k0, -1)
                patch_t = (patch_t - patch_t[:, :, :1]).astype(jnp.float32)
            else:
                patch_t = None
            vnf_sel = jnp.take_along_axis(vnf_flat, sel, axis=1)

            for bi, blk in enumerate(self._blocks):
                if bi > 0 and caps[bi] < sel_alive.shape[1]:
                    # re-compact among current survivors
                    sel2, sel_alive, count = self._compact(
                        sel_alive, caps[bi])
                    overflow = overflow | (count > caps[bi])
                    win_ids = jnp.take_along_axis(win_ids, sel2, axis=1)
                    patch = jnp.take_along_axis(
                        patch, sel2[:, :, None], axis=1)
                    if patch_t is not None:
                        patch_t = jnp.take_along_axis(
                            patch_t, sel2[:, :, None], axis=1)
                    vnf_sel = jnp.take_along_axis(vnf_sel, sel2, axis=1)
                passed = self._block_eval(blk, patch, patch_t, vnf_sel)
                sel_alive = sel_alive & passed

        iy, ix = win_ids // nx, win_ids % nx
        bx = jnp.asarray(map_x)[ix]
        by = jnp.asarray(map_y)[iy]
        boxes = jnp.stack(
            [bx, by, jnp.full_like(bx, l.out_w), jnp.full_like(bx, l.out_h)],
            axis=-1)
        return boxes, sel_alive, overflow

    # ------------------------------------------------------------------- API
    def _per_level_items(self) -> list:
        """Execution plan for per-level mode: pyramid-kernel CHUNKS (one
        program per chunk — fewer programs through the remote compiler
        than one-per-level, and the source image crosses HBM once per
        chunk) interleaved with solo levels."""
        covered: dict[int, tuple[int, ...]] = {}
        for chunk in self._pyramid_chunks():
            for li in chunk:
                covered[li] = chunk
        items: list = []
        for li in range(len(self.levels)):
            ch = covered.get(li)
            if ch is None:
                items.append(li)
            elif li == ch[0]:
                items.append(ch)
        n = self._xla_group_levels
        if n > 1:
            # group runs of consecutive SOLO levels into ("xla", (li...))
            # multi-level programs (fewer programs through the remote
            # compiler/tunnel); pyramid-kernel chunks pass through as-is
            # and level order is preserved, so concatenated outputs are
            # identical to the ungrouped plan
            grouped: list = []
            run: list[int] = []

            def flush():
                if len(run) > 1:
                    grouped.append(("xla", tuple(run)))
                elif run:
                    grouped.append(run[0])
                run.clear()

            for it in items:
                if isinstance(it, int):
                    run.append(it)
                    if len(run) >= n:
                        flush()
                else:
                    flush()
                    grouped.append(it)
            flush()
            return grouped
        return items

    def _make_item_jit(self, item):
        if isinstance(item, tuple) and item and item[0] == "xla":
            def run_group(gray, _idxs=item[1]):
                res = [self._eval_level(gray, li=li) for li in _idxs]
                ovf = res[0][2]
                for r in res[1:]:
                    ovf = ovf | r[2]
                return (jnp.concatenate([r[0] for r in res], axis=1),
                        jnp.concatenate([r[1] for r in res], axis=1),
                        ovf)
            return jax.jit(run_group)
        if isinstance(item, tuple):
            def run_chunk(gray, _chunk=item):
                res = self._eval_chunk(gray, _chunk)
                ovf = res[0][2]
                for r in res[1:]:
                    ovf = ovf | r[2]
                return (jnp.concatenate([r[0] for r in res], axis=1),
                        jnp.concatenate([r[1] for r in res], axis=1),
                        ovf)
            return jax.jit(run_chunk)
        return jax.jit(functools.partial(self._eval_level, li=item))

    def _detect_per_level(self, gray):
        """Fallback execution mode: one jitted program per plan item
        (pyramid-kernel chunk or solo level).

        The whole-pyramid program for fine scale factors (e.g. 1.1 → ~29
        levels) can exceed what the TPU remote compiler handles; per-item
        programs are small, compile reliably, and pipeline back-to-back."""
        if not hasattr(self, "_level_jits"):
            self._level_jits = {}
        outs = []
        for item in self._per_level_items():
            fn = self._level_jits.get(item)
            if fn is None:
                fn = self._make_item_jit(item)
                self._level_jits[item] = fn
            try:
                outs.append(fn(gray))
            except Exception as e:  # noqa: BLE001 — Pallas lowering failure
                msg = str(e)
                if ("remote_compile" in msg or "INTERNAL" in msg
                        or "UNAVAILABLE" in msg):
                    # transient tunnel/compiler-transport failure, not a
                    # lowering problem — retry once before concluding
                    # anything about the kernels (disabling Pallas on a
                    # dropped HTTP response would silently degrade perf)
                    time.sleep(2.0)
                    try:
                        outs.append(fn(gray))
                        continue
                    except Exception:  # noqa: BLE001
                        pass  # persists → treat as a real backend failure
                # a persistently failing multi-level XLA GROUP (remote
                # compiler rejecting the larger program) degrades to one
                # program per level before anything Pallas-related is
                # touched — same outputs, just more programs
                if (isinstance(item, tuple) and item and item[0] == "xla"
                        and self._xla_group_levels > 1):
                    self._xla_group_levels = 1
                    self._level_jits = {}
                    return self._detect_per_level(gray)
                # last recovery tier: a Pallas kernel this backend can't
                # lower (Mosaic version drift, exotic level geometry).
                # The XLA dense/integral phase is bit-identical — drop
                # the kernels engine-wide and restart the plan (now all
                # solo XLA levels; rare path, recomputation is cheap).
                if not (self._use_pallas_dense or self._use_pallas_integral
                        or self._use_pallas_pyramid):
                    raise
                self._use_pallas_dense = False
                self._use_pallas_integral = False
                self._use_pallas_pyramid = False
                self._pyramid_kernels.clear()
                self._dense_kernels.clear()
                self._level_jits = {}
                return self._detect_per_level(gray)
        boxes = jnp.concatenate([o[0] for o in outs], axis=1)
        valid = jnp.concatenate([o[1] for o in outs], axis=1)
        ovf = outs[0][2]
        for o in outs[1:]:
            ovf = ovf | o[2]
        return boxes, valid, ovf

    def warmup(self, batch_size: int = 1, threads: int = 8) -> None:
        """Pre-compile the detection programs for `batch_size` frames.

        Deep pyramids (sf=1.1 → ~29 per-level programs) compile through the
        TPU remote compiler serially on first use (minutes); issuing the
        level compiles from a thread pool pipelines them (the GIL is
        released during XLA/remote compilation). Combined with the
        persistent compilation cache (package __init__), later processes
        skip compilation entirely."""
        gray = jnp.zeros((batch_size, self.image_h, self.image_w), jnp.uint8)
        if not self._force_per_level:
            jax.block_until_ready(self._detect_jit(gray))
            return
        if not hasattr(self, "_level_jits"):
            self._level_jits = {}
        import concurrent.futures as cf

        def build(item):
            fn = self._level_jits.get(item) or self._make_item_jit(item)
            # the remote TPU compiler reaches the device over an HTTP
            # tunnel that can drop a response mid-read (observed:
            # "INTERNAL: .../remote_compile: read body: response body
            # closed before all bytes were read" killing a whole warmup).
            # Transient — completed sibling compiles persist in the cache,
            # so a short retry only redoes the failed item.
            for attempt in range(3):
                try:
                    jax.block_until_ready(fn(gray))
                    break
                except Exception as e:  # noqa: BLE001
                    msg = str(e)
                    transient = ("remote_compile" in msg
                                 or "INTERNAL" in msg
                                 or "UNAVAILABLE" in msg)
                    if attempt == 2 or not transient:
                        raise
                    time.sleep(2.0 * (attempt + 1))
            return item, fn

        try:
            with cf.ThreadPoolExecutor(max_workers=threads) as ex:
                for item, fn in ex.map(build, self._per_level_items()):
                    self._level_jits[item] = fn
        except Exception:  # noqa: BLE001 — persistent compile failure
            # multi-level XLA groups are a pure program-count optimization;
            # if the remote compiler rejects the larger programs, degrade
            # to one program per level and warm that plan instead (same
            # degradation _detect_per_level applies at detection time)
            if self._xla_group_levels <= 1:
                raise
            self._xla_group_levels = 1
            self._level_jits = {}
            with cf.ThreadPoolExecutor(max_workers=threads) as ex:
                for item, fn in ex.map(build, self._per_level_items()):
                    self._level_jits[item] = fn

    def detect_raw(self, gray):
        """gray [B,H,W] or [H,W] uint8 → (boxes, valid, overflow) on device.

        Uses one whole-pyramid program; on backend compile failure (graph
        too large for the remote TPU compiler) falls back permanently to
        per-level programs."""
        gray = jnp.asarray(gray)
        if gray.ndim == 2:
            gray = gray[None]
        if gray.shape[-2:] != (self.image_h, self.image_w):
            raise ValueError(
                f"frame shape {gray.shape[-2:]} does not match engine size "
                f"({self.image_h}, {self.image_w}); build a CascadeEngine for "
                "this resolution")
        if getattr(self, "_force_per_level", False):
            return self._detect_per_level(gray)
        try:
            return self._detect_jit(gray)
        except Exception:  # noqa: BLE001 — backend compile failure
            if self._use_pallas_pyramid and self._pyramid_chunks():
                # first recovery tier: retry the whole-pyramid program
                # without the chunk kernels (per-level kernels intact)
                self._use_pallas_pyramid = False
                self._pyramid_kernels.clear()
                self._detect_jit = jax.jit(self._detect_impl)
                try:
                    return self._detect_jit(gray)
                except Exception:  # noqa: BLE001
                    pass
            self._force_per_level = True
            return self._detect_per_level(gray)

    # -------------------------------------------------- on-device grouping
    RAW_GROUP_CAP = 256   # accepted windows entering grouping (pre-compact)
    OUT_GROUP_CAP = 64    # grouped detections leaving the device

    def _group_impl(self, boxes, valid, overflow, *, min_neighbors: int):
        """Device minNeighbors grouping on the raw-candidate output: compact
        accepted windows to RAW_GROUP_CAP, run the exact fixed-capacity
        groupRectangles, compact grouped classes to OUT_GROUP_CAP. Only
        [B, OUT_GROUP_CAP] arrays ever cross to the host — the reference's
        per-frame output is grouped boxes (kmsfacedetect.cpp:809-811 → 832),
        so the host result path stays O(detections), not O(windows)."""
        cap = min(self.RAW_GROUP_CAP, valid.shape[1])
        sel, sel_alive, count = self._compact(valid, cap)
        overflow = overflow | (count > cap)
        cand = jnp.take_along_axis(boxes, sel[:, :, None], axis=1)
        avg, gvalid, weights = jax.vmap(
            lambda r, v: group_rectangles_jax(r, v, min_neighbors)
        )(cand, sel_alive)
        k = min(self.OUT_GROUP_CAP, avg.shape[1])
        sel2, g_alive, _ = self._compact(gvalid, k)
        out = jnp.take_along_axis(avg, sel2[:, :, None], axis=1)
        wts = jnp.take_along_axis(weights, sel2, axis=1)
        return out, g_alive, wts, overflow

    def _compact_raw_impl(self, boxes, valid, overflow):
        cap = min(self.RAW_GROUP_CAP, valid.shape[1])
        sel, sel_alive, count = self._compact(valid, cap)
        overflow = overflow | (count > cap)
        out = jnp.take_along_axis(boxes, sel[:, :, None], axis=1)
        return out, sel_alive, overflow

    def compact_raw(self, raw):
        """(boxes, valid, overflow) → same, compacted to RAW_GROUP_CAP slots
        (device-side), so ungrouped candidate transfers stay small."""
        if not hasattr(self, "_compact_jit"):
            self._compact_jit = jax.jit(self._compact_raw_impl)
        return self._compact_jit(*raw)

    def group_device(self, raw, min_neighbors: int):
        """(boxes, valid, overflow) from detect_raw → grouped device arrays
        (boxes [B,K,4], valid [B,K], weights [B,K], overflow [B])."""
        if not hasattr(self, "_group_jits"):
            self._group_jits = {}
        fn = self._group_jits.get(min_neighbors)
        if fn is None:
            fn = jax.jit(functools.partial(
                self._group_impl, min_neighbors=min_neighbors))
            self._group_jits[min_neighbors] = fn
        return fn(*raw)

    def detect_grouped(self, gray, min_neighbors: int = 3):
        """Whole device path: frames → grouped detections, no host compute.
        Returns (boxes [B,K,4], valid [B,K], weights [B,K], overflow [B])."""
        return self.group_device(self.detect_raw(gray), min_neighbors)

    def detect(self, gray, min_neighbors: int = 3) -> list[np.ndarray]:
        """Full detectMultiScale parity: per-frame grouped [M,4] (x,y,w,h).

        min_neighbors == 0 skips grouping entirely (OpenCV semantics).
        Grouping runs on device (`_group_impl`); only the tiny grouped
        output is transferred.
        """
        if min_neighbors == 0:
            boxes, valid, _ = self.detect_raw(gray)
            boxes, valid = np.asarray(boxes), np.asarray(valid)
            return [boxes[b][valid[b]] for b in range(boxes.shape[0])]
        out, g_alive, _, _ = self.detect_grouped(gray, min_neighbors)
        out, g_alive = np.asarray(out), np.asarray(g_alive)
        return [out[b][g_alive[b]] for b in range(out.shape[0])]

    def candidates(self, gray) -> list[np.ndarray]:
        """Raw accepted windows per frame (pre-grouping), for parity tests."""
        boxes, valid, _ = self.detect_raw(gray)
        boxes, valid = np.asarray(boxes), np.asarray(valid)
        return [boxes[b][valid[b]] for b in range(boxes.shape[0])]


@functools.lru_cache(maxsize=64)
def load_cascade(path: str) -> HaarCascade:
    from .xml_loader import load_cascade_xml
    return load_cascade_xml(path)


_ENGINE_CACHE: dict = {}


def get_engine(cascade_path: str, image_size: tuple[int, int],
               scale_factor: float = 1.25,
               min_size: tuple[int, int] = (0, 0),
               max_size: tuple[int, int] = (0, 0)) -> CascadeEngine:
    """Process-wide engine cache. Engines are stateless after construction
    and their jitted programs are expensive to rebuild (especially through
    the TPU remote compiler) — models share them by configuration."""
    import os as _os
    key = (_os.path.abspath(cascade_path), tuple(image_size),
           float(scale_factor), tuple(min_size), tuple(max_size))
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        eng = CascadeEngine(load_cascade(cascade_path), image_size,
                            scale_factor, min_size=min_size,
                            max_size=max_size)
        _ENGINE_CACHE[key] = eng
    return eng
