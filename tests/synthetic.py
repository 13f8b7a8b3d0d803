"""Synthetic scene generators shared by optimizer/pipeline tests.

A rendered world of random 3D points observed by a camera trajectory gives
exact ground truth for unit tests and ATE integration tests (the reference
has no unit suite; SURVEY.md §4 defines this as our improvement)."""
import numpy as np

from orb_slam3_detailed_comments_tpu.models import cameras

CAM = cameras.pinhole(fx=458.0, fy=457.0, cx=367.0, cy=248.0, width=752, height=480)


def look_at_R(eye, target, up=(0, -1, 0)):
    """World->camera rotation for a camera at `eye` looking at `target`."""
    z = np.asarray(target, np.float64) - eye
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0)


def make_scene(rng, n_points=400, n_cams=8, radius=6.0, noise_px=0.5):
    """Points in a box at the origin; cameras on an arc looking inward.

    Returns dict with R [C,3,3], t [C,3] (world->cam), points [P,3],
    uv [C,P,2] noisy projections, vis [C,P] visibility mask.
    """
    pts = rng.uniform(-2.0, 2.0, size=(n_points, 3))
    pts[:, 2] *= 0.5
    Rs, ts = [], []
    for k in range(n_cams):
        ang = (k / max(n_cams - 1, 1) - 0.5) * 1.2
        eye = np.array([radius * np.sin(ang), 0.3 * np.sin(3 * ang), -radius * np.cos(ang)])
        R = look_at_R(eye, np.zeros(3))
        t = -R @ eye
        Rs.append(R)
        ts.append(t)
    R = np.stack(Rs).astype(np.float32)
    t = np.stack(ts).astype(np.float32)

    import jax.numpy as jnp
    pc = np.einsum("cij,pj->cpi", R, pts) + t[:, None, :]
    uv = np.asarray(cameras.project(CAM, jnp.asarray(pc, jnp.float32)))
    vis = (pc[..., 2] > 0.3) & np.asarray(
        cameras.in_image(CAM, jnp.asarray(uv)), bool)
    uv = uv + rng.normal(0, noise_px, size=uv.shape)
    return dict(R=R, t=t.astype(np.float32), points=pts.astype(np.float32),
                uv=uv.astype(np.float32), vis=vis, cam=CAM)


def rotvec_to_R(w):
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.lie import so3
    return np.asarray(so3.exp(jnp.asarray(w, jnp.float32)))
