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

__version__ = "0.3.0"


def cache_dir_for_platforms(plats: str) -> str:
    """Persistent-compile-cache dir for a JAX_PLATFORMS value on this host
    (see _setup_compilation_cache for why the platform mode is in the key).
    Call with 'cpu' before forcing the CPU backend after import time."""
    import hashlib
    import os
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    fp = hashlib.sha1(
        (platform.machine() + flags + ":" + plats).encode()).hexdigest()[:12]
    return os.environ.get("VCA_JAX_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "nubomedia_vca_tpu",
        f"jax_cache_{fp}")


def force_cpu_backend() -> None:
    """Switch this process to the CPU backend AND re-key the persistent
    compile cache for it (must run before the first jax device query).
    Use this instead of a bare `jax.config.update('jax_platforms', 'cpu')`
    so platform-crossed XLA:CPU AOT cache entries can't load.

    Idempotent: when the process already forced the CPU platform (e.g. a
    test harness that configured its own cache dir before importing this
    package), the call is a no-op — re-keying the cache dir mid-process
    would silently cold-start compilation for everything after it."""
    import os

    import jax

    if jax.config.jax_platforms == "cpu":
        return
    jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("VCA_NO_COMPILE_CACHE"):
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir_for_platforms("cpu"))


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (opt-out via
    VCA_NO_COMPILE_CACHE=1, relocate via VCA_JAX_CACHE_DIR).

    The cascade engines build deep multiscale pyramid programs whose
    first-time XLA compiles cost seconds (CPU) to minutes (TPU remote
    compiler); caching the executables on disk makes every later process
    start detection immediately. No-op when the application already
    configured a cache dir.

    The cache dir is keyed by a host-CPU + platform-mode fingerprint
    (cache_dir_for_platforms): XLA:CPU AOT results baked for one machine's
    ISA extensions can stall or SIGABRT on another, and processes using a
    remote/tunnel TPU platform (e.g. axon) produce XLA:CPU AOT entries
    targeting the REMOTE host's CPU — observed locally as
    "Target machine feature ... not supported" loader errors followed by
    multi-minute stalls and shutdown aborts."""
    import os

    if os.environ.get("VCA_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        cache = cache_dir_for_platforms(
            os.environ.get("JAX_PLATFORMS", "default"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


_setup_compilation_cache()
