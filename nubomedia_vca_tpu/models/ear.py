"""Ear detector — TPU rebuild of NuboEarDetector (kmseardetect.cpp).

The reference detects PROFILE faces (haarcascade_profileface.xml,
kmseardetect.cpp:29), then looks for the ear in a side ROI of the face
(TOP/DOWN 20% cropped, outer half + EXTRA_ROI 50 px, kmseardetect.cpp:
684-707); the right side is handled by horizontally flipping the image and
re-running (kmseardetect.cpp:796-803, cascades cross-wired to exploit the
flip, 167-190). Both `face_profile` and `ear` detections are emitted
(kmseardetect.cpp:195-280). No event gating (detect_event stored but unused
in processing). Ear anti-vibration: MAX_NUM_FPS_WITH_NO_DETECTION = 4.

TPU design: the flip is a device-side reverse; profile and ear cascade
passes run batched over [normal, flipped] in one program. Right-side
detections are mirrored back to true image coordinates (the reference emits
them in flipped coordinates — a quirk we do not reproduce).

The reference's mcs left/right-ear cascades (kmseardetect.cpp:30-31) are
old-format — parsed natively by our loader when dropped into a cascade
search dir (cascade/paths.py); they are not shipped with OpenCV. Our flip
design runs ONE ear cascade over [normal, flipped], so the right-ear model
(which the reference's LEAR macro cross-wires into the left-ear slot to
exploit the flip, kmseardetect.cpp:167-190) is the preferred default.
When no mcs model is present, the framework's own trained substitute
(vca_ear_synthetic.xml, shipped in the wheel — cascade/train.py) is used,
so the ear path works out of the box; with no ear cascade at all only
profile faces are emitted. Defaults pair coherently: real mcs ear model →
real profile cascade; synthetic ear model → synthetic profile cascade
(demo-grade — drop in the mcs files or pass explicit paths for
production ear detection on real video).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..cascade.paths import find_cascade
from ..ops.histogram import equalize_hist
from ..ops.resize import resize_linear_exact
from .parts import PartDetectorBase, PartDetectorConfig, Roi, cv_round

PROFILE_CASCADE = "/usr/share/opencv4/haarcascades/haarcascade_profileface.xml"
# probed in order: the real profile model, then the trained synthetic
# fallback shipped in the wheel (cartoon fixtures; real deployments always
# have the system file — tools/train_part_cascades.py documents why)
PROFILE_CASCADES = ("haarcascade_profileface.xml",
                    "vca_profileface_synthetic.xml")
# mcs models (the reference's exact files) first; the framework's trained
# substitute ships in the wheel so the ear path works out of the box
EAR_CASCADES = ("haarcascade_mcs_rightear.xml", "haarcascade_mcs_leftear.xml",
                "vca_ear_synthetic.xml")

TOP_PERCENTAGE = 20    # kmseardetect.cpp:38
DOWN_PERCENTAGE = 20   # kmseardetect.cpp:39
EXTRA_ROI = 50         # kmseardetect.cpp:51


@dataclasses.dataclass
class EarDetectorConfig(PartDetectorConfig):
    euclidean_distance: int = 7
    face_cascade_path: str | None = None   # None → PROFILE_CASCADES probe
    ear_cascade_path: str | None = None
    max_fps_without_detection: int = 4   # kmseardetect.cpp:48


class EarDetector(PartDetectorBase):
    FACE_MIN_NEIGHBORS = 2          # kmseardetect.cpp:656-659
    FACE_MIN_SIZE = (3, 3)
    PART_SCALE_FACTOR = 1.1         # EAR_SCALE_FACTOR, kmseardetect.cpp:44
    PART_MIN_NEIGHBORS = 3
    PART_MIN_SIZE = (1, 1)

    def __init__(self, frame_size, config: EarDetectorConfig | None = None):
        import os

        config = config or EarDetectorConfig()
        ear_path = config.ear_cascade_path or find_cascade(*EAR_CASCADES)
        if config.face_cascade_path is None:
            # coherent default pairing: a real mcs ear model pairs with the
            # real profile cascade (production); the trained synthetic ear
            # model pairs with the trained synthetic profile cascade (the
            # real profileface, trained on photographs, never fires on the
            # cartoon fixtures the synthetic ear model is trained for)
            synth_ear = (ear_path is not None and os.path.basename(ear_path)
                         == "vca_ear_synthetic.xml")
            probe = (("vca_profileface_synthetic.xml",) + PROFILE_CASCADES
                     if synth_ear else PROFILE_CASCADES)
            config.face_cascade_path = find_cascade(*probe)
        if config.face_cascade_path is None:
            raise ValueError(
                "EarDetector found no profile-face cascade; install OpenCV "
                "haarcascades or pass face_cascade_path")
        cascades = {}
        if ear_path:
            cascades["ear"] = ear_path
        super().__init__(frame_size, config, cascades)

    def _device_pass(self, gray):
        """Both orientations in one batched program: frames [B] become
        [2B] = [normal..., flipped...]."""
        gray = jnp.asarray(gray)
        if gray.ndim == 2:
            gray = gray[None]
        both = jnp.concatenate([gray, gray[:, :, ::-1]], axis=0)
        face_img = equalize_hist(
            resize_linear_exact(both, (self.face_w, self.face_h)))
        part_img = equalize_hist(
            resize_linear_exact(both, (self.part_w, self.part_h)))
        face_raw = self.face_engine.group_device(
            self.face_engine.detect_raw(face_img), self.FACE_MIN_NEIGHBORS)
        part_raw = {name: eng.compact_raw(eng.detect_raw(part_img))
                    for name, eng in self.part_engines.items()}
        self._n_real = gray.shape[0]
        return face_raw, part_raw

    def _side_rois(self, faces, flipped: bool):
        """Side ROI per profile face (kmseardetect.cpp:684-707), in part-res
        coordinates of the (possibly flipped) image."""
        s = self.scale_f2p
        rois = []
        for (fx, fy, fw, fh) in np.asarray(faces).reshape(-1, 4):
            top = cv_round(fh * TOP_PERCENTAGE / 100)
            down = cv_round(fh * DOWN_PERCENTAGE / 100)
            x = cv_round((fx + fw // 2) * s)
            y = cv_round((fy + top) * s)
            h = cv_round((fh - down) * s)
            w = cv_round((fw / 2) * s) + EXTRA_ROI
            rois.append(Roi(x, y, w, h).clip(self.part_w, self.part_h))
        return rois

    def _process_frame(self, faces, part_raw, b):
        # faces for normal orientation at index b; flipped at b + n_real
        out_faces = []
        out_ears = []
        face_raw = self._face_raw
        for side, idx in (("left", b), ("right", b + self._n_real)):
            side_faces = self._faces_from_raw(face_raw, idx)
            flipped = side == "right"
            # report profile faces in true coords
            sf = self.face_w
            for (fx, fy, fw, fh) in side_faces:
                tx = self.face_w - fx - fw if flipped else fx
                out_faces.append((
                    cv_round(tx * self.frame_w / self.face_w),
                    cv_round(fy * self.frame_w / self.face_w),
                    cv_round(fw * self.frame_w / self.face_w),
                    cv_round(fh * self.frame_w / self.face_w)))
            if "ear" in self.part_engines:
                cand = self._part_candidates(part_raw, "ear", idx)
                for roi in self._side_rois(side_faces, flipped):
                    ears = self._roi_detect(cand, roi, biggest=True)
                    for (x, y, w, h) in self._to_original(ears):
                        if flipped:
                            x = self.frame_w - x - w
                        out_ears.append((x, y, w, h))
        out_ears = self._merge_consecutive(
            "ear", out_ears, self.config.euclidean_distance)
        return {"face_profile": out_faces, "ear": out_ears}

    def process(self, gray, face_boxes=None, stream: int = 0):
        """Ear module ignores detect-event gating (reference parity:
        detect_event is stored but unused in processing)."""
        self._active = self._stream_state(stream)
        gray = np.asarray(gray)
        if gray.ndim == 2:
            gray = gray[None]
        n = gray.shape[0]
        mask = self.gop.mask(n)
        results = []
        if not mask.any():
            return [self._idle_result() for _ in range(n)]
        self._face_raw, part_raw = self._device_pass(gray[mask])
        bi = 0
        for i in range(n):
            if not mask[i]:
                results.append(self._idle_result())
                continue
            results.append(self._process_frame(None, part_raw, bi))
            bi += 1
        return results

    def _idle_result(self):
        return {"face_profile": [], "ear": []}
