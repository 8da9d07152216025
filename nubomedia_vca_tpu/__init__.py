"""nubomedia_vca_tpu — TPU-native video content analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
nubomedia/NUBOMEDIA-VCA (six Kurento/GStreamer vision filters: face, eye,
nose, mouth, ear detectors and a motion tracker). Frames from many streams
are batched into device arrays; the hot path (colorspace conversion, image
pyramid, integral-image prefix sums, multi-stage Haar-cascade window
evaluation) runs as fused XLA/Pallas computations; part detectors run as a
second batched cascade pass over ROI crops gathered from face boxes; the
tracker is a detect-then-propagate scan over frame windows.

Layout (mirrors SURVEY.md §7 build plan):
  core/      frame + geometry types (FrameBatch, Boxes)
  ops/       image ops: color, resize, histogram, integral, grouping, drawing
  cascade/   OpenCV-cascade-XML loader + multiscale detection engine
  models/    the six filters (face/eye/nose/mouth/ear/tracker) + CNN detector
  pipeline/  event bus, filter chaining, GOP/frame-skip scheduling, overlay
  parallel/  device mesh, shardings, collectives, multi-stream feeding
  api/       NuboXxxDetector remote-object surface + JSON-RPC server
  utils/     tracing, config, logging
  cpp/       native host components (frame ingest, XML parse) with py fallback
"""

__version__ = "0.1.0"
