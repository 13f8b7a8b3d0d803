"""End-to-end host-side stage profile of the monocular pipeline on a
synthetic world (no dataset needed). Run on the real chip:

    python scripts/profile_stages.py [n_frames]

Prints total wall fps and the per-stage time table (utils/timing.py spans,
the reference's REGISTER_TIMES taxonomy, Tracking.cc:2059-2068 etc.).
NOTE: wall numbers through the axon tunnel include ~24 ms RTT per dispatch;
use scripts/devtime.py for honest device times of single programs.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from orb_slam3_detailed_comments_tpu.models import cameras
from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
from orb_slam3_detailed_comments_tpu.utils import synth_render


def main(n=80):
    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    rng = np.random.default_rng(7)
    planes = synth_render.default_world(rng)
    R, t = synth_render.orbit_trajectory(n)
    slam = System(cam, MONOCULAR)
    slam.warmup()
    t0 = time.perf_counter()
    for i in range(n):
        img = synth_render.render_frame(cam, planes, R[i], t[i])
        slam.track_monocular(img, i * 0.05)
    dt = time.perf_counter() - t0
    print(f"total {dt:.1f}s, {n/dt:.1f} fps, kf={slam.n_keyframes} "
          f"pts={slam.n_map_points}")
    slam.print_time_stats()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
