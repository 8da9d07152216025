"""The six filter model families (face/eye/mouth/nose/ear/tracker) plus the
trainable CNN detector."""

from .face import FaceDetector, FaceDetectorConfig, FaceTracks, TrackedFace
from .eye import EyeDetector, EyeDetectorConfig
from .mouth import MouthDetector, MouthDetectorConfig
from .nose import NoseDetector, NoseDetectorConfig
from .ear import EarDetector, EarDetectorConfig
from .tracker import Tracker, TrackerConfig

__all__ = [
    "FaceDetector", "FaceDetectorConfig", "FaceTracks", "TrackedFace",
    "EyeDetector", "EyeDetectorConfig",
    "MouthDetector", "MouthDetectorConfig",
    "NoseDetector", "NoseDetectorConfig",
    "EarDetector", "EarDetectorConfig",
    "Tracker", "TrackerConfig",
]
