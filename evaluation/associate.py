#!/usr/bin/env python
"""Associate two TUM-format trajectory/measurement files by timestamp
(reference: evaluation/associate.py).

Usage: python evaluation/associate.py <first.txt> <second.txt>
           [--max_difference 0.02] [--offset 0.0]

Prints matched lines as "<first line> <second line>" pairs, one per match,
like the reference tool (consumed by evaluate_ate_scale.py or shell scripts).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def read_file_list(path):
    """{timestamp: [fields...]} skipping comment lines, like the reference."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            out[float(parts[0])] = parts[1:]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("first")
    ap.add_argument("second")
    ap.add_argument("--max_difference", type=float, default=0.02)
    ap.add_argument("--offset", type=float, default=0.0)
    args = ap.parse_args()

    from orb_slam3_detailed_comments_tpu.utils.evaluate_ate import associate

    a = read_file_list(args.first)
    b = read_file_list(args.second)
    ts_a = np.array(sorted(a.keys()))
    ts_b = np.array(sorted(b.keys())) + args.offset
    pairs = associate(ts_a, ts_b, max_dt=args.max_difference)
    for i, j in pairs:
        ta, tb = float(ts_a[i]), float(ts_b[j] - args.offset)
        print(f"{ta:.6f} {' '.join(a[ta])} {tb:.6f} {' '.join(b[tb])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
