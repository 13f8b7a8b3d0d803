"""Benchmark: monocular tracking-step throughput per chip.

Measures the fused per-frame tracking program (ORB pyramid/FAST/BRIEF
extraction -> projection matching -> GN pose optimization) on one 752x480
frame — the reference's per-frame hot path (SURVEY.md §3.2) which it paces
at 20 fps on an i7 (reference: Examples/Monocular/mono_euroc.cc:167-170,
README real-time claim). vs_baseline = our frames/s / 20.

Prints exactly one JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g

    fn, args = g.entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)  # compile

    # realistic textured frames; DISTINCT input per iteration so no runtime
    # layer can replay/memoize identical executions
    from orb_slam3_detailed_comments_tpu.utils import synth_render
    from orb_slam3_detailed_comments_tpu.models import cameras
    rng = np.random.default_rng(3)
    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    planes = synth_render.default_world(rng)
    n_frames = 8
    R, t = synth_render.orbit_trajectory(n_frames)
    imgs = [jnp.asarray(synth_render.render_frame(cam, planes, R[i], t[i]))
            for i in range(n_frames)]
    jax.block_until_ready(jfn(imgs[0], *args[1:]))

    n_iter = 48
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = jfn(imgs[i % n_frames], *args[1:])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "mono_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
