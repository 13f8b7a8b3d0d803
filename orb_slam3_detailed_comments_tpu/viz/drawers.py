"""Headless visualization: frame overlays and map renders to numpy images.

Replaces FrameDrawer / MapDrawer / Viewer (reference: src/FrameDrawer.cc,
src/MapDrawer.cc, src/Viewer.cc). The reference opens a Pangolin GL window;
here rendering is headless (numpy/cv2) so it runs in datacenter jobs —
frames can be written as PNG/video for offline inspection, which is the
observability path that matters for a TPU deployment.
"""
from __future__ import annotations

import numpy as np


def draw_frame(img: np.ndarray, xy: np.ndarray, valid: np.ndarray,
               matched: np.ndarray | None = None,
               state_text: str = "") -> np.ndarray:
    """Keypoint overlay (reference: FrameDrawer::DrawFrame).

    img [H, W] grayscale float; xy [N, 2]; valid [N]; matched [N] bool for
    keypoints associated to map points (drawn brighter/green).
    """
    import cv2
    vis = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    for i in np.where(valid)[0]:
        u, v = int(xy[i, 0]), int(xy[i, 1])
        if not (0 <= u < img.shape[1] and 0 <= v < img.shape[0]):
            continue
        if matched is not None and matched[i]:
            cv2.circle(vis, (u, v), 2, (0, 255, 0), -1)
        else:
            cv2.circle(vis, (u, v), 1, (255, 160, 0), -1)
    if state_text:
        cv2.putText(vis, state_text, (10, img.shape[0] - 12),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
    return vis


def draw_map_topdown(mapstore, size: int = 640, margin: float = 1.2,
                     axes=(0, 2)) -> np.ndarray:
    """Top-down orthographic render of map points + keyframe positions +
    covisibility edges (reference: MapDrawer::DrawMapPoints/DrawKeyFrames).
    axes: which world axes to plot (default x-z)."""
    import cv2
    vis = np.zeros((size, size, 3), np.uint8)
    pts = mapstore.pt_xyz[mapstore.pt_valid][:, axes]
    kfs = mapstore.kf_ids()
    centers = -np.einsum("kij,ki->kj",
                         np.transpose(mapstore.kf_R[kfs], (0, 2, 1)),
                         mapstore.kf_t[kfs])[:, axes]
    allp = np.concatenate([pts, centers], 0) if len(pts) else centers
    if len(allp) == 0:
        return vis
    lo = allp.min(0)
    hi = allp.max(0)
    span = max((hi - lo).max(), 1e-6) * margin
    mid = (hi + lo) / 2

    def to_px(p):
        q = (p - mid) / span + 0.5
        return (q * (size - 1)).astype(int)

    for p in to_px(pts):
        if 0 <= p[0] < size and 0 <= p[1] < size:
            vis[size - 1 - p[1], p[0]] = (140, 140, 140)
    cpx = to_px(centers)
    for a, b in zip(cpx[:-1], cpx[1:]):
        cv2.line(vis, (a[0], size - 1 - a[1]), (b[0], size - 1 - b[1]),
                 (0, 128, 255), 1)
    for p in cpx:
        cv2.circle(vis, (p[0], size - 1 - p[1]), 2, (0, 255, 0), -1)
    return vis


def save_png(path: str, img: np.ndarray):
    import cv2
    cv2.imwrite(path, img)
