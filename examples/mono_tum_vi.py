#!/usr/bin/env python
"""Monocular TUM-VI (fisheye, no IMU) example
(reference: Examples/Monocular/mono_tum_vi.cc; the KannalaBrandt8 rig is
described by Examples/Monocular/TUM_512.yaml). TUM-VI sequences ship in
EuRoC/ASL layout (mav0/cam0/data + data.csv); frames are CLAHE-equalized
like the reference main (mono_tum_vi.cc CLAHE clipLimit 3.0, 8x8 tiles).

Usage:
    python examples/mono_tum_vi.py <settings.yaml> <sequence_dir>... [<out.txt>]

Multiple sequence dirs exercise the multi-map Atlas like the reference's
multi-sequence mode (mono_tum_vi.cc num_seq loop + ChangeDataset).
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
    out = outs[0] if outs else "trajectory_tum_vi_mono.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import (
        System, MONOCULAR)
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, MONOCULAR)

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
        paths, ts = datasets.load_euroc_images(seq, cam="cam0")
        print(f"[seq {si}] {len(paths)} frames in {seq}")
        frames = datasets.prefetch_gray(paths, resize_to=s.resize_to)
        for i, (img, t) in enumerate(zip(frames, ts)):
            img = equalize(img)
            t0 = time.perf_counter()
            slam.track_monocular(img, float(t))
            t_track.append(time.perf_counter() - t0)
            if i % 50 == 0:
                print(f"frame {i}/{len(paths)} state={slam.tracker.state} "
                      f"kf={slam.n_keyframes} pts={slam.n_map_points} "
                      f"{1.0 / max(np.mean(t_track[-50:]), 1e-9):.1f} fps")

    slam.save_trajectory_tum(out)
    slam.save_keyframe_trajectory_tum(out.replace(".txt", "_kf.txt"))
    print(f"median track time {np.median(t_track) * 1e3:.1f} ms; saved {out}")
    slam.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
