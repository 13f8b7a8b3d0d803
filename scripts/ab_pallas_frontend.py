"""Interleaved A/B of the fused-Pallas dense frontend vs the XLA path.

Runs on whatever backend jax picks (the axon TPU under the tunnel).
Interleaves timing blocks of both variants in ONE process so tunnel
bandwidth drift cancels; cycles distinct frames so nothing can replay
identical executions. Prints per-round block times and medians.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import faulthandler
    faulthandler.dump_traceback_later(520, exit=True)
    import jax
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.ops import extractor
    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.utils import synth_render

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(3)
    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)

    n_frames = 8
    imgs = [jnp.asarray(np.zeros((480, 752), np.float32))]

    def run(flag, n):
        os.environ["ORB_TPU_PALLAS"] = flag
        out = None
        for i in range(n):
            out = extractor.extract(imgs[i % len(imgs)])
        jax.block_until_ready(out.desc)

    # compile both variants FIRST (rendering frames first has repeatedly
    # wedged the axon compile service)
    print("compiling xla...", flush=True)
    run("0", 1)
    print("compiling pallas...", flush=True)
    run("1", 1)

    planes = synth_render.default_world(rng)
    R, t = synth_render.orbit_trajectory(n_frames)
    imgs = [jnp.asarray(synth_render.render_frame(cam, planes, R[i], t[i]))
            for i in range(n_frames)]
    # warm
    run("0", 4)
    run("1", 4)

    n_iter = 24
    xla_ts, pal_ts = [], []
    for rnd in range(6):
        for flag, ts in (("0", xla_ts), ("1", pal_ts)):
            t0 = time.perf_counter()
            run(flag, n_iter)
            ts.append((time.perf_counter() - t0) / n_iter * 1e3)
        print(f"round {rnd}: xla {xla_ts[-1]:.2f} ms  pallas {pal_ts[-1]:.2f} ms",
              flush=True)
    print(f"median: xla {np.median(xla_ts):.2f} ms  "
          f"pallas {np.median(pal_ts):.2f} ms")
    os.environ.pop("ORB_TPU_PALLAS", None)


if __name__ == "__main__":
    main()
