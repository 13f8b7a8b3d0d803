#!/usr/bin/env python
"""Stereo KITTI odometry example (reference: Examples/Stereo/stereo_kitti.cc).

Usage: python examples/stereo_kitti.py <settings.yaml> <sequence_dir> [<out>]

Writes the KITTI-format trajectory (3x4 row-major world poses per line).
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
    out = sys.argv[3] if len(sys.argv) > 3 else "trajectory_kitti.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import System, STEREO
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, STEREO)
    lp, rp, ts = datasets.load_kitti_stereo(seq)
    n = min(len(lp), len(rp), len(ts))
    print(f"{n} stereo pairs in {seq}")
    t_track = []
    lf = datasets.prefetch_gray(lp[:n], resize_to=s.resize_to)
    rf = datasets.prefetch_gray(rp[:n], resize_to=s.resize_to)
    for i, (l, r) in enumerate(zip(lf, rf)):
        t0 = time.perf_counter()
        slam.track_stereo(l, r, float(ts[i]))
        t_track.append(time.perf_counter() - t0)
        if i % 100 == 0:
            print(f"frame {i}/{n} state={slam.tracker.state} "
                  f"kf={slam.n_keyframes} pts={slam.n_map_points}")
    slam.save_trajectory_kitti(out)
    print(f"median track {np.median(t_track) * 1e3:.1f} ms; saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
