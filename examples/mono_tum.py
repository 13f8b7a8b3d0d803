#!/usr/bin/env python
"""Monocular TUM RGB-D example (reference: Examples/Monocular/mono_tum.cc).

Usage: python examples/mono_tum.py <settings.yaml> <sequence_dir> [<out>]

Tracks only the RGB stream of a TUM RGB-D sequence (depth ignored) and
writes the TUM-format trajectory.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    settings_path, seq = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "trajectory_mono_tum.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, MONOCULAR)
    rgb_p, rgb_t, _d_p, _d_t = datasets.load_tum_rgbd(seq)
    n = len(rgb_p)
    print(f"{n} frames in {seq}")
    for i, img in enumerate(datasets.prefetch_gray(rgb_p[:n], resize_to=s.resize_to)):
        slam.track_monocular(img, float(rgb_t[i]))
        if i % 50 == 0:
            print(f"frame {i}/{n} state={slam.tracker.state} "
                  f"kf={slam.n_keyframes} pts={slam.n_map_points}")
    slam.save_trajectory_tum(out)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
