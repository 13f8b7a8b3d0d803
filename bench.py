"""Benchmark: monocular tracking-step device throughput per chip.

Measures the fused per-frame tracking program (ORB pyramid/FAST/BRIEF
extraction -> projection matching -> GN pose optimization) on one 752x480
frame — the reference's per-frame hot path (SURVEY.md §3.2) which it paces
at 20 fps on an i7 (reference: Examples/Monocular/mono_euroc.cc:167-170,
README real-time claim). vs_baseline = our frames/s / 20.

Methodology (see scripts/devtime.py): the step runs R times back-to-back
inside ONE jitted program, chained through the optimized pose and a
data-dependent image perturbation, with a single scalar fetch; two rep
counts are differenced to cancel the fixed RTT/dispatch cost. This is the
true device rate a deployment gets with dispatch pipelined — naive
block_until_ready timing is meaningless through the axon tunnel (it
returns before the device finishes; execute RPCs serialize at ~24 ms).

Prints exactly one JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from scripts.devtime import device_ms
    from orb_slam3_detailed_comments_tpu.utils import synth_render
    from orb_slam3_detailed_comments_tpu.models import cameras

    fn, args = g.entry()

    # realistic textured frame so FAST/top-k see real corner statistics
    rng = np.random.default_rng(3)
    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    planes = synth_render.default_world(rng)
    R, t = synth_render.orbit_trajectory(2)
    img = jnp.asarray(synth_render.render_frame(cam, planes, R[0], t[0]))

    _, R0, t0, pts, desc = args

    def step(image, R0, t0, pts, desc):
        """One tracking step; the optimized pose + inlier count fold into
        the scalar carry, so consecutive steps are data-dependent like a
        real tracked sequence."""
        R1, t1, n_inl = fn(image, R0, t0, pts, desc)
        return t1.sum() + R1[0, 0] + n_inl.astype(jnp.float32)

    ms = device_ms(step, img, R0, t0, pts, desc)
    fps = 1000.0 / ms

    print(json.dumps({
        "metric": "mono_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
