"""Device-path phase breakdown on the current backend.

Times cumulative prefixes of the per-frame device program (resize →
equalize → integral → dense+norm stages → full detect → +grouping) at
async steady state, so optimization effort goes where the time is.

    python tools/profile_breakdown.py [B] [B2 ...]

Each phase runs in-process (no D2H between timings; one tiny sync at the
end of each timing via a scalar fetch is avoided — block_until_ready only).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_one(engine, work_w, work_h, gray, B, n_iter=100):
    import jax
    import jax.numpy as jnp
    from nubomedia_vca_tpu.ops.histogram import equalize_hist
    from nubomedia_vca_tpu.ops.resize import resize_linear_exact
    from nubomedia_vca_tpu.ops.integral import integral_image, sq_integral_image

    l0 = engine.levels[0]

    def p_resize(g):
        return resize_linear_exact(g, (work_w, work_h))

    def p_equalize(g):
        return equalize_hist(p_resize(g))

    def p_work_resize(g):
        # per-level resizes of the work image (all levels)
        work = p_equalize(g)
        return [resize_linear_exact(work, (l.sw, l.sh))
                for l in engine.levels]

    def p_integral_xla(g):
        return [(integral_image(img), sq_integral_image(img))
                for img in p_work_resize(g)]

    def p_integral_pallas(g):
        from nubomedia_vca_tpu.ops.pallas.integral_pallas import (
            integral_images_pallas)
        return [integral_images_pallas(img) for img in p_work_resize(g)]

    def p_detect(g):
        return engine._detect_impl(p_equalize(g))

    def p_grouped(g):
        return engine._group_impl(*engine._detect_impl(p_equalize(g)),
                                  min_neighbors=3)

    phases = [
        ("resize", p_resize),
        ("equalize", p_equalize),
        ("level_resizes", p_work_resize),
        ("integral_xla", p_integral_xla),
    ]
    if jax.default_backend() == "tpu":
        phases.append(("integral_pallas", p_integral_pallas))
    phases += [
        ("detect_full", p_detect),
        ("detect_grouped", p_grouped),
    ]

    if getattr(engine, "_alt", None) is not None:
        alt = engine._alt

        def p_detect_alt(g):
            return alt._detect_impl(p_equalize(g))

        def p_grouped_alt(g):
            return alt._group_impl(*alt._detect_impl(p_equalize(g)),
                                   min_neighbors=3)

        phases += [
            ("detect_full_ALT", p_detect_alt),
            ("detect_grouped_ALT", p_grouped_alt),
        ]

    print(f"--- B={B} work={work_w}x{work_h} levels={len(engine.levels)} "
          f"backend={jax.default_backend()}")
    for name, fn in phases:
        step = jax.jit(fn)
        try:
            out = step(gray)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED: {e}")
            continue
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = step(gray)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        us = dt / n_iter * 1e6
        print(f"{name:18s} {us:10.1f} us/batch   {B * n_iter / dt:12.0f} fps",
              flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256]
    import jax.numpy as jnp
    from nubomedia_vca_tpu.cascade.engine import CascadeEngine
    from nubomedia_vca_tpu.cascade.xml_loader import load_cascade_xml

    sys.path.insert(0, "tests")
    from fixtures import face_scene

    W, H, WORK_W = 1280, 720, 160
    work_h = int(round(H * WORK_W / W))
    casc = load_cascade_xml(
        "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml")
    engine = CascadeEngine(casc, (WORK_W, work_h), 1.25)
    # ALT engine: the opposite dense-phase implementation, for A/B
    engine._alt = CascadeEngine(
        casc, (WORK_W, work_h), 1.25,
        use_pallas_dense=not engine._use_pallas_dense)
    print(f"default engine pallas_dense={engine._use_pallas_dense}; "
          f"ALT={engine._alt._use_pallas_dense}")
    rng = np.random.RandomState(0)
    for B in sizes:
        frames = np.stack([
            face_scene(W, H, faces=((rng.randint(200, 1080),
                                     rng.randint(200, 520), 150),),
                       noise=6, seed=i)
            for i in range(B)
        ])
        bench_one(engine, WORK_W, work_h, jnp.asarray(frames), B)


if __name__ == "__main__":
    main()
