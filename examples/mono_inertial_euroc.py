#!/usr/bin/env python
"""Monocular-inertial EuRoC example
(reference: Examples/Monocular-Inertial/mono_inertial_euroc.cc).

Usage:
    python examples/mono_inertial_euroc.py <settings.yaml> <sequence_dir>... [<out.txt>]

Multiple sequence dirs exercise the multi-map Atlas like the reference's
multi-sequence mode (mono_inertial_euroc.cc num_seq loop + ChangeDataset).
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
    settings_path = sys.argv[1]
    seqs = [a for a in sys.argv[2:] if not a.endswith(".txt")]
    outs = [a for a in sys.argv[2:] if a.endswith(".txt")]
    out = outs[0] if outs else "trajectory_tum.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import (
        System, IMU_MONOCULAR)
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, IMU_MONOCULAR)
    t_track = []
    for si, seq in enumerate(seqs):
        if si > 0:
            slam.change_dataset()
        paths, ts = datasets.load_euroc_images(seq)
        imu_ts, gyro, acc = datasets.load_euroc_imu(seq)
        # drop frames before the first IMU sample (reference does the same)
        first = np.searchsorted(ts, imu_ts[0])
        paths, ts = paths[first:], ts[first:]
        print(f"[seq {si}] {len(paths)} frames, {len(imu_ts)} IMU samples "
              f"in {seq}")
        t_prev = ts[0]
        frames = datasets.prefetch_gray(paths, resize_to=s.resize_to)
        for i, (img, t) in enumerate(zip(frames, ts)):
            lo, hi = datasets.imu_between(imu_ts, t_prev, t)
            window = ((acc[lo:hi], gyro[lo:hi], imu_ts[lo:hi])
                      if hi > lo else None)
            t0 = time.perf_counter()
            slam.track_monocular(img, float(t), imu=window)
            t_track.append(time.perf_counter() - t0)
            t_prev = t
            if i % 50 == 0:
                print(f"frame {i}/{len(paths)} state={slam.tracker.state} "
                      f"kf={slam.n_keyframes} pts={slam.n_map_points} "
                      f"imu_init={slam.map.imu_initialized} "
                      f"{1.0 / max(np.mean(t_track[-50:]), 1e-9):.1f} fps")

    slam.save_trajectory_tum(out)
    slam.save_keyframe_trajectory_tum(out.replace(".txt", "_kf.txt"))
    print(f"median track time {np.median(t_track) * 1e3:.1f} ms; saved {out}")
    slam.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
