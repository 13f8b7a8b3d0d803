#!/usr/bin/env python
"""Monocular EuRoC example (reference: Examples/Monocular/mono_euroc.cc).

Usage:
    python examples/mono_euroc.py <settings.yaml> <sequence_dir> [<out.txt>]

Multiple sequence dirs exercise the multi-map Atlas like the reference's
multi-sequence mode (mono_euroc.cc:173-183).
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

    from orb_slam3_detailed_comments_tpu.pipeline.system import System, MONOCULAR
    from orb_slam3_detailed_comments_tpu.utils import config, datasets

    s = config.load_settings(settings_path)
    slam = System.from_settings(s, MONOCULAR)
    t_track = []
    for si, seq in enumerate(seqs):
        if si > 0:
            # multi-sequence: fresh map, welded back by place recognition
            # (reference: System::ChangeDataset, mono_euroc.cc:173-183)
            slam.change_dataset()
        paths, ts = datasets.load_euroc_images(seq)
        print(f"[seq {si}] {len(paths)} frames in {seq}")
        frames = datasets.prefetch_gray(paths, resize_to=s.resize_to)
        # pipelined ingest: frame i+1's extraction runs on-device while the
        # host walks frame i's state machine (same poses as track_monocular)
        t0 = time.perf_counter()
        for i, _ in enumerate(slam.track_monocular_iter(
                (img, float(t)) for img, t in zip(frames, ts))):
            t1 = time.perf_counter()
            t_track.append(t1 - t0)
            t0 = t1
            if i % 50 == 0:
                print(f"frame {i}/{len(paths)} state={slam.tracker.state} "
                      f"kf={slam.n_keyframes} pts={slam.n_map_points} "
                      f"maps={len(slam.atlas.maps)} "
                      f"{1.0 / max(np.mean(t_track[-50:]), 1e-9):.1f} fps")

    slam.save_trajectory_tum(out)
    slam.save_keyframe_trajectory_tum(out.replace(".txt", "_kf.txt"))
    print(f"median track time {np.median(t_track) * 1e3:.1f} ms; saved {out}")
    if s.save_atlas:
        slam.save_atlas(s.save_atlas)
    slam.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
