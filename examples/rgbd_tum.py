#!/usr/bin/env python
"""RGB-D TUM example (reference: Examples/RGB-D/rgbd_tum.cc).

Usage: python examples/rgbd_tum.py <settings.yaml> <sequence_dir> [<out>]
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
    out = sys.argv[3] if len(sys.argv) > 3 else "trajectory_rgbd.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import System, RGBD
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, RGBD, baseline=s.baseline or 0.08)
    rgb_p, rgb_t, d_p, d_t = datasets.load_tum_rgbd(seq)
    pairs = datasets.associate_rgbd(rgb_t, d_t)
    print(f"{len(pairs)} associated rgb-depth pairs in {seq}")
    for i, (ri, di) in enumerate(pairs):
        img = config.resize_image(datasets.read_gray(rgb_p[ri]), s.resize_to)
        depth = datasets.read_depth(d_p[di], factor=1.0 / s.depth_map_factor
                                    if s.depth_map_factor < 1 else 5000.0)
        depth = config.resize_image(depth, s.resize_to)
        slam.track_rgbd(img, depth, float(rgb_t[ri]))
        if i % 50 == 0:
            print(f"frame {i}/{len(pairs)} state={slam.tracker.state} "
                  f"kf={slam.n_keyframes} pts={slam.n_map_points}")
    slam.save_trajectory_tum(out)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
