#!/usr/bin/env python
"""Stereo-inertial TUM-VI (fisheye) example
(reference: Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc; the
KannalaBrandt8 rig is described by Examples/Stereo-Inertial/TUM_512.yaml
with Camera1/Camera2 + Stereo.T_c1_c2).

TUM-VI sequences ship in EuRoC/ASL layout (mav0/cam{0,1}/data + data.csv,
mav0/imu0/data.csv), so the EuRoC loaders apply. Like the reference main,
frames are CLAHE-equalized (clipLimit 3.0, 8x8 tiles,
stereo_inertial_tum_vi.cc:136,169) before extraction.

Usage:
    python examples/stereo_inertial_tum_vi.py <settings.yaml> <sequence_dir>... [<out.txt>]

Multiple sequence dirs exercise the multi-map Atlas like the reference's
multi-sequence mode (stereo_inertial_tum_vi.cc num_seq loop + ChangeDataset).
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
    out = outs[0] if outs else "trajectory_tum_vi.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import (
        System, IMU_STEREO)
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, IMU_STEREO)

    try:
        import cv2
        clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
        equalize = lambda im: clahe.apply(im.astype(np.uint8))
    except ImportError:
        equalize = lambda im: im

    t_track = []
    for si, seq in enumerate(seqs):
        if si > 0:
            slam.change_dataset()
        paths_l, ts = datasets.load_euroc_images(seq, cam="cam0")
        paths_r, _ = datasets.load_euroc_images(seq, cam="cam1")
        imu_ts, gyro, acc = datasets.load_euroc_imu(seq)
        first = int(np.searchsorted(ts, imu_ts[0]))
        paths_l, paths_r, ts = paths_l[first:], paths_r[first:], ts[first:]
        print(f"[seq {si}] {len(paths_l)} frames, {len(imu_ts)} IMU samples "
              f"in {seq}")
        t_prev = ts[0]
        lf = datasets.prefetch_gray(paths_l, resize_to=s.resize_to)
        rf = datasets.prefetch_gray(paths_r, resize_to=s.resize_to)
        for i, (img_l, img_r, t) in enumerate(zip(lf, rf, ts)):
            img_l = equalize(img_l)
            img_r = equalize(img_r)
            lo, hi = datasets.imu_between(imu_ts, t_prev, t)
            window = ((acc[lo:hi], gyro[lo:hi], imu_ts[lo:hi])
                      if hi > lo else None)
            t0 = time.perf_counter()
            slam.track_stereo(img_l, img_r, float(t), imu=window)
            t_track.append(time.perf_counter() - t0)
            t_prev = t
            if i % 50 == 0:
                print(f"frame {i}/{len(paths_l)} state={slam.tracker.state} "
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
