"""Headless visualization surfaces: drawers + the HTML web viewer."""
import json
import os

import numpy as np

from orb_slam3_detailed_comments_tpu.mapping.mapstore import (MapConfig,
                                                              MapStore)
from orb_slam3_detailed_comments_tpu.viz import drawers, webviewer


def _tiny_map(n_kf=4, n_pts=50):
    cfg = MapConfig(max_kf=16, max_pt=256, n_feat=64)
    m = MapStore(cfg)
    rng = np.random.default_rng(0)
    ids = m.alloc_points(n_pts)
    m.pt_xyz[ids] = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    m.pt_valid[ids] = True
    F = cfg.n_feat
    for i in range(n_kf):
        # every KF observes the same first 32 points -> covisibility >= 15
        fp = np.full(F, -1, np.int64)
        fp[:32] = ids[:32]
        m.add_keyframe(np.eye(3, dtype=np.float32),
                       np.array([0.1 * i, 0, 0], np.float32),
                       float(i), i,
                       np.zeros((F, 2), np.float32),
                       np.zeros((F, 2), np.float32),
                       np.zeros(F, np.int32), np.zeros(F, np.float32),
                       np.zeros_like(m.kf_feat_desc[0]), fp >= 0, fp)
    return m


def test_export_html_mapstore(tmp_path):
    m = _tiny_map()
    out = str(tmp_path / "viewer.html")
    webviewer.export_html(m, out, trajectory=np.zeros((7, 3)))
    html = open(out).read()
    assert "<canvas" in html
    payload = json.loads(
        html.split("const DATA = ", 1)[1].split(";\n", 1)[0])
    assert len(payload["maps"]) == 1
    mp = payload["maps"][0]
    assert len(mp["points"]) == 50
    assert len(mp["kf_centers"]) == 4
    assert len(mp["kf_axes"][0]) == 9
    assert len(mp["covis"]) == 4 * 3 // 2       # all pairs share 32 points
    assert len(payload["traj"]) == 7


def test_export_html_point_subsample(tmp_path):
    m = _tiny_map()
    out = str(tmp_path / "viewer.html")
    webviewer.export_html(m, out, max_points=10)
    payload = json.loads(
        open(out).read().split("const DATA = ", 1)[1].split(";\n", 1)[0])
    assert len(payload["maps"][0]["points"]) == 10


def test_draw_map_topdown_runs():
    img = drawers.draw_map_topdown(_tiny_map())
    assert img.ndim == 3 and img.shape[2] == 3
