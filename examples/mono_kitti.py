#!/usr/bin/env python
"""Monocular KITTI odometry example (reference: Examples/Monocular/mono_kitti.cc).

Usage: python examples/mono_kitti.py <settings.yaml> <sequence_dir> [<out>]

Uses the left grayscale camera (image_0) of a KITTI odometry sequence and
writes the TUM-format trajectory (KITTI format needs metric scale, which
monocular cannot provide).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    settings_path, seq = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "trajectory_mono_kitti.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, MONOCULAR)
    lp, _rp, ts = datasets.load_kitti_stereo(seq)
    n = min(len(lp), len(ts))
    print(f"{n} frames in {seq}")
    t_track = []
    for i, img in enumerate(datasets.prefetch_gray(lp[:n], resize_to=s.resize_to)):
        t0 = time.perf_counter()
        slam.track_monocular(img, float(ts[i]))
        t_track.append(time.perf_counter() - t0)
        if i % 100 == 0:
            print(f"frame {i}/{n} state={slam.tracker.state} "
                  f"kf={slam.n_keyframes} pts={slam.n_map_points}")
    slam.save_trajectory_tum(out)
    print(f"median track {np.median(t_track) * 1e3:.1f} ms; saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
