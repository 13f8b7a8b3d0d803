#!/usr/bin/env python
"""Stereo EuRoC example (reference: Examples/Stereo/stereo_euroc.cc).

Usage: python examples/stereo_euroc.py <settings.yaml> <sequence_dir>... [<out>]

Multiple sequence dirs exercise the multi-map Atlas like the reference's
multi-sequence mode (stereo_euroc.cc num_seq loop + ChangeDataset).
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
    out = outs[0] if outs else "trajectory_stereo.txt"

    from orb_slam3_detailed_comments_tpu.pipeline.system import System, STEREO
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    # legacy EuRoC yaml: raw cameras + rectification blocks -> rectify here
    # (reference: System::TrackStereo pre-rectification, System.cc:285-292)
    rect = config.stereo_rectify_maps(s)
    if rect is not None:
        maps_l, maps_r, cam, baseline = rect
        print("using precomputed stereo rectification")
    else:
        maps_l = maps_r = None
        cam, baseline = s.camera, s.baseline
    # rectified path: plain pinhole pair, no Camera2 two-camera mode
    slam = System.from_settings(s, STEREO, camera=cam, baseline=baseline,
                                camera2=None, T_c1c2=None)
    t_track = []
    for si, seq in enumerate(seqs):
        if si > 0:
            slam.change_dataset()
        lp, lts = datasets.load_euroc_images(seq, cam="cam0")
        rp, _ = datasets.load_euroc_images(seq, cam="cam1")
        n = min(len(lp), len(rp))
        print(f"[seq {si}] {n} stereo pairs in {seq}")
        lf = datasets.prefetch_gray(lp[:n], resize_to=s.resize_to)
        rf = datasets.prefetch_gray(rp[:n], resize_to=s.resize_to)

        def feed():
            for i, (l, r) in enumerate(zip(lf, rf)):
                if maps_l is not None:
                    l = config.rectify(l, maps_l)
                    r = config.rectify(r, maps_r)
                yield l, r, float(lts[i])

        # pipelined ingest: the pair's extraction + row matching runs
        # on-device one frame ahead of the host state machine
        t0 = time.perf_counter()
        for i, _ in enumerate(slam.track_stereo_iter(feed())):
            t1 = time.perf_counter()
            t_track.append(t1 - t0)
            t0 = t1
            if i % 50 == 0:
                print(f"frame {i}/{n} state={slam.tracker.state} "
                      f"kf={slam.n_keyframes} pts={slam.n_map_points}")
    slam.save_trajectory_tum(out)
    print(f"median track {np.median(t_track) * 1e3:.1f} ms; saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
