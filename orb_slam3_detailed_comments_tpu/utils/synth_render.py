"""Synthetic multi-plane sequence renderer for integration tests and benches.

Renders a camera moving through a world of textured planes via exact
plane-induced homographies (cv2.warpPerspective), giving pixel-accurate
imagery with exact ground-truth trajectories — the integration-test analog
of the reference's EuRoC dataset runs (SURVEY.md §4), usable offline.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..models import cameras


def _texture(rng, size=1200, n_blobs=4000):
    img = np.full((size, size), 120.0, np.float32)
    ys = rng.integers(0, size - 24, n_blobs)
    xs = rng.integers(0, size - 24, n_blobs)
    for y, x in zip(ys, xs):
        h, w = rng.integers(4, 22), rng.integers(4, 22)
        img[y:y + h, x:x + w] = rng.uniform(10, 245)
    return np.clip(img, 0, 255)


def texture_natural(rng, size=1200, alpha=1.2, contrast=55.0):
    """1/f^alpha-spectrum texture: the power-law amplitude statistics of
    natural imagery (vs _texture's piecewise-constant blobs). Corner
    detectors fire on a much broader, denser response distribution here —
    the domain-shift probe for the vocabulary (VERDICT r3: the bundled
    vocab is trained and evaluated on blob statistics only)."""
    f = np.fft.fftfreq(size)
    fr = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    fr[0, 0] = fr[0, 1]
    amp = 1.0 / fr ** alpha
    phase = rng.uniform(0, 2 * np.pi, (size, size))
    spec = amp * np.exp(1j * phase)
    img = np.real(np.fft.ifft2(spec))
    img = (img - img.mean()) / (img.std() + 1e-9)
    return np.clip(120.0 + contrast * img, 0, 255).astype(np.float32)


def texture_lit(rng, size=1200, n_blobs=2000):
    """Blob texture under strong low-frequency lighting: a smooth
    illumination field (gradient + a few gaussian 'lamps', x0.4-1.6) over
    the base — breaks any brightness-constancy assumption in descriptors."""
    base = _texture(rng, size, n_blobs)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    gdir = rng.uniform(0, 2 * np.pi)
    field = 0.35 * (np.cos(gdir) * xx + np.sin(gdir) * yy)
    for _ in range(int(rng.integers(2, 5))):
        cy, cx = rng.uniform(0, 1, 2)
        sig = rng.uniform(0.08, 0.3)
        field += rng.uniform(0.2, 0.6) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
    field = 0.4 + 1.2 * (field - field.min()) / (np.ptp(field) + 1e-9)
    return np.clip(base * field, 0, 255).astype(np.float32)


def texture_specular(rng, size=1200, n_blobs=1800, n_spots=14):
    """Blob texture with saturated specular spots: bright elliptical
    highlights that clip to white (a glossy plane under point lights) —
    saturation plateaus kill gradient information locally."""
    base = _texture(rng, size, n_blobs)
    yy, xx = np.meshgrid(np.arange(size, dtype=np.float32),
                         np.arange(size, dtype=np.float32), indexing="ij")
    for _ in range(n_spots):
        cy, cx = rng.uniform(0, size, 2)
        sy, sx = rng.uniform(8, 60, 2)
        th = rng.uniform(0, np.pi)
        dy, dx = yy - cy, xx - cx
        u = np.cos(th) * dx + np.sin(th) * dy
        v = -np.sin(th) * dx + np.cos(th) * dy
        base += 400.0 * np.exp(-(u ** 2 / (2 * sx ** 2)
                                 + v ** 2 / (2 * sy ** 2)))
    return np.clip(base, 0, 255).astype(np.float32)


TEXTURE_DOMAINS = {
    "blob": lambda rng, size: _texture(rng, size),
    "natural_1f": lambda rng, size: texture_natural(rng, size),
    "lit": lambda rng, size: texture_lit(rng, size),
    "specular": lambda rng, size: texture_specular(rng, size),
}


@dataclass
class Plane:
    origin: np.ndarray      # [3] world point of texture (0,0)
    e1: np.ndarray          # [3] world direction of texture u axis (per px)
    e2: np.ndarray          # [3] world direction of texture v axis (per px)
    texture: np.ndarray


def default_world(rng, extent=14.0, tex_size=1200):
    """A back wall plus two offset foreground panels."""
    ppm = tex_size / extent  # pixels per meter
    planes = [
        Plane(np.array([-extent / 2, -extent / 2, 8.0]),
              np.array([1 / ppm, 0, 0.0]), np.array([0, 1 / ppm, 0.0]),
              _texture(rng, tex_size)),
        Plane(np.array([-5.0, -3.0, 5.5]),
              np.array([1 / ppm, 0, 0.02 / ppm]), np.array([0, 1 / ppm, 0.0]),
              _texture(rng, int(tex_size * 0.5), n_blobs=1200)),
        Plane(np.array([0.5, -2.0, 4.0]),
              np.array([1 / ppm, 0, -0.03 / ppm]), np.array([0, 1 / ppm, 0.01 / ppm]),
              _texture(rng, int(tex_size * 0.4), n_blobs=900)),
    ]
    return planes


def render_frame(cam: cameras.CameraParams, planes, R_cw, t_cw):
    """Render the planes (painter's order = list order, later on top)."""
    import cv2
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    out = np.zeros((cam.height, cam.width), np.float32)
    filled = np.zeros((cam.height, cam.width), bool)
    for pl in planes:
        # homography texture(u,v) -> image: x ~ K [R e1 | R e2 | R o + t]
        M = np.stack([R_cw @ pl.e1, R_cw @ pl.e2, R_cw @ pl.origin + t_cw], axis=1)
        H = K @ M
        # only render if plane is in front (check center of texture)
        c = R_cw @ (pl.origin + pl.e1 * pl.texture.shape[1] / 2
                    + pl.e2 * pl.texture.shape[0] / 2) + t_cw
        if c[2] < 0.2:
            continue
        warped = cv2.warpPerspective(
            pl.texture, H, (cam.width, cam.height), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=-1.0)
        mask = warped >= 0
        out[mask] = warped[mask]
        filled |= mask
    out[~filled] = 90.0
    return out


def orbit_trajectory(n_frames, radius=0.0, advance=2.5, sway=0.35,
                     yaw_amp=0.08):
    """Forward translation with lateral sway + gentle yaw: plenty of parallax,
    always facing the planes. Returns (R_cw [T,3,3], t_cw [T,3]) world->cam."""
    from ..lie import so3
    import jax.numpy as jnp
    Rs, ts = [], []
    for i in range(n_frames):
        a = i / max(n_frames - 1, 1)
        cw = np.array([sway * np.sin(2 * np.pi * a * 1.5),
                       0.15 * np.sin(2 * np.pi * a * 0.8),
                       advance * a])
        yaw = yaw_amp * np.sin(2 * np.pi * a)
        pitch = 0.03 * np.sin(2 * np.pi * a * 1.3)
        R_wc = np.asarray(so3.exp(jnp.asarray([pitch, yaw, 0.0], jnp.float32)))
        R_cw = R_wc.T
        t_cw = -R_cw @ cw
        Rs.append(R_cw.astype(np.float32))
        ts.append(t_cw.astype(np.float32))
    return np.stack(Rs), np.stack(ts)


def camera_centers(R_cw, t_cw):
    return -np.einsum("tij,ti->tj", R_cw, t_cw)


def render_frame_raycast(cam, planes, R_cw, t_cw):
    """Render by per-pixel ray casting through the camera model — works for
    ANY camera (Kannala-Brandt fisheye included), unlike the homography
    renderer which assumes an ideal pinhole. ~10x slower; use for fisheye
    tests."""
    import jax.numpy as jnp
    from ..models import cameras as cam_mod
    H, W = cam.height, cam.width
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32) + 0.5,
                         np.arange(H, dtype=np.float32) + 0.5)
    uv = np.stack([uu.reshape(-1), vv.reshape(-1)], 1)
    rays = np.asarray(cam_mod.unproject_bearing(cam, jnp.asarray(uv)),
                      np.float64)                      # [N, 3] camera frame
    R_wc = R_cw.T.astype(np.float64)
    C_w = -R_wc @ t_cw.astype(np.float64)
    rays_w = rays @ R_wc.T                             # world-frame rays
    N = rays_w.shape[0]
    out = np.full(N, 90.0, np.float32)
    depth = np.full(N, np.inf)
    for pl in planes:
        n = np.cross(pl.e1, pl.e2)
        nn = n / np.linalg.norm(n)
        denom = rays_w @ nn
        tnum = (pl.origin - C_w) @ nn
        d = np.where(np.abs(denom) > 1e-9, tnum / denom, np.inf)
        hit = (d > 0.05) & np.isfinite(d)
        Xw = C_w + rays_w * d[:, None]
        rel = Xw - pl.origin
        # texel coords via the (generally non-orthogonal) basis
        G = np.array([[pl.e1 @ pl.e1, pl.e1 @ pl.e2],
                      [pl.e2 @ pl.e1, pl.e2 @ pl.e2]])
        Ginv = np.linalg.inv(G)
        ab = (rel @ np.stack([pl.e1, pl.e2], 1)) @ Ginv.T   # [N, 2] texels
        h, w = pl.texture.shape
        inside = (ab[:, 0] >= 0) & (ab[:, 0] < w - 1) & \
                 (ab[:, 1] >= 0) & (ab[:, 1] < h - 1) & hit & (d < depth)
        ai = ab[inside]
        x0 = ai[:, 0].astype(int); y0 = ai[:, 1].astype(int)
        fx = (ai[:, 0] - x0).astype(np.float32)
        fy = (ai[:, 1] - y0).astype(np.float32)
        tx = pl.texture
        val = (tx[y0, x0] * (1 - fx) * (1 - fy) + tx[y0, x0 + 1] * fx * (1 - fy)
               + tx[y0 + 1, x0] * (1 - fx) * fy + tx[y0 + 1, x0 + 1] * fx * fy)
        out[inside] = val
        depth[inside] = d[inside]
    return out.reshape(H, W)


def inertial_trajectory(n_frames, imu_per_frame=20, dt=0.005,
                        gravity=np.array([0.0, 9.81, 0.0]),
                        true_bg=np.zeros(3), true_ba=np.zeros(3),
                        accel_amp=0.8, v0=np.array([0.05, 0.0, 0.35])):
    """Ground-truth body trajectory + exact IMU, facing the default world.

    The trajectory is produced by integrating smooth analytic body rates and
    world accelerations with the same first-order scheme the preintegration
    model assumes, so the IMU stream is exactly consistent with the poses.
    Camera == body; the camera starts at identity looking down +z (toward
    the planes of default_world) and gravity points along +y (image down).

    Returns dict with per-frame R_cw [T,3,3], t_cw [T,3], frame times ts [T],
    and per-frame IMU windows: list of (acc [M,3], gyro [M,3], t [M]).
    """
    from ..lie import so3
    import jax.numpy as jnp
    n_steps = n_frames * imu_per_frame
    R = np.eye(3)
    v = np.asarray(v0, np.float64).copy()
    p = np.zeros(3)
    g = np.asarray(gravity, np.float64)
    Rs_f, ps_f = [R.copy()], [p.copy()]
    accs, gyros, t_meas = [], [], []
    for k in range(n_steps):
        t = k * dt
        w_b = np.array([0.03 * np.sin(2 * np.pi * 0.7 * t + 1.0),
                        0.08 * np.sin(2 * np.pi * 0.5 * t),
                        0.02 * np.sin(2 * np.pi * 0.9 * t + 2.0)])
        a_w = accel_amp * np.array([np.sin(2 * np.pi * 0.6 * t),
                                    0.5 * np.sin(2 * np.pi * 0.9 * t + 1.0),
                                    0.4 * np.sin(2 * np.pi * 0.4 * t + 2.0)])
        a_b = R.T @ (a_w - g)
        accs.append(a_b + true_ba)
        gyros.append(w_b + true_bg)
        t_meas.append((k + 1) * dt)
        p = p + v * dt + 0.5 * (R @ a_b + g) * dt * dt
        v = v + (R @ a_b + g) * dt
        R = R @ np.asarray(so3.exp(jnp.asarray(w_b * dt, jnp.float32)),
                           np.float64)
        if (k + 1) % imu_per_frame == 0:
            Rs_f.append(R.copy())
            ps_f.append(p.copy())
    accs = np.stack(accs).astype(np.float32)
    gyros = np.stack(gyros).astype(np.float32)
    t_meas = np.asarray(t_meas)
    R_wb = np.stack(Rs_f)                       # [T+1? no: n_frames+1...]
    p_w = np.stack(ps_f)
    # frames 0..n_frames-1 at times 0, imu_per_frame*dt, ...
    R_wb = R_wb[:n_frames]
    p_w = p_w[:n_frames]
    R_cw = np.transpose(R_wb, (0, 2, 1)).astype(np.float32)
    t_cw = -np.einsum("tij,tj->ti", R_cw, p_w).astype(np.float32)
    ts = np.arange(n_frames) * imu_per_frame * dt
    windows = [None]  # frame 0 has no preceding window
    for i in range(1, n_frames):
        s0, s1 = (i - 1) * imu_per_frame, i * imu_per_frame
        windows.append((accs[s0:s1], gyros[s0:s1], t_meas[s0:s1]))
    return dict(R_cw=R_cw, t_cw=t_cw, ts=ts, windows=windows,
                gravity=g, centers=p_w.astype(np.float32))


def inertial_loop_trajectory(n_frames, imu_per_frame=10, dt=0.005,
                             radius=3.0, closes=1.06,
                             gravity=np.array([0.0, 9.81, 0.0]),
                             true_bg=np.zeros(3), true_ba=np.zeros(3),
                             wobble=0.05, yaw_burst=None):
    """Ground-truth loop around the inside of box_world + exact IMU.

    The body circles at `radius` facing radially outward (loop_trajectory's
    geometry) for `closes` revolutions, with a small body-rate/acceleration
    wobble so all IMU axes are excited. Exactly like inertial_trajectory,
    the trajectory IS the first-order integration of the emitted IMU stream
    (camera == body, gravity +y = image down), so preintegration sees a
    noise-free instrument; the returned frame poses come from the same
    integration.

    Returns the inertial_trajectory dict (R_cw, t_cw, ts, windows, gravity,
    centers).
    """
    def rodrigues(w):
        # host-side SO(3) exp: 5k+ per-step device round-trips through
        # lie.so3 dominate generation time otherwise
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.eye(3)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    n_steps = n_frames * imu_per_frame
    total_t = n_steps * dt
    omega = 2 * np.pi * closes / total_t          # mean yaw rate (rad/s)
    # start of loop_trajectory at a=0: R_wb = I, c = [0,0,r], v tangent +x
    R = np.eye(3)
    p = np.array([0.0, 0.0, radius])
    v = np.array([radius * omega, 0.0, 0.0])
    g = np.asarray(gravity, np.float64)
    Rs_f, ps_f = [R.copy()], [p.copy()]
    accs, gyros, t_meas = [], [], []
    for k in range(n_steps):
        t = k * dt
        # SPEED MODULATION is essential for mono-inertial scale
        # observability: constant-speed circular motion has a CONSTANT
        # body-frame acceleration (centripetal always along -z_body),
        # which is degenerate with gravity + accel bias — the IMU then
        # cannot anchor metric scale (measured: Horn scale ~4.5 without
        # this). A ±30% tangential speed swing breaks the degeneracy.
        r_cur = max(np.hypot(p[0], p[2]), 1e-6)
        s_cur = np.hypot(v[0], v[2])              # current tangential speed
        # amplitudes sized for ~2-3 m/s^2 peak tangential+vertical accel:
        # handheld/TUM-VI-class dynamics — the scale-observability floor is
        # proportional to IMU noise / accel excitation, and at <1 m/s^2 the
        # mono-inertial scale cannot be pinned below ~10% (measured)
        s_des = radius * omega * (1.0 + 0.30 * np.sin(2 * np.pi * 0.20 * t)
                                  + 0.35 * np.sin(2 * np.pi * 0.53 * t + 1.2)
                                  + 0.20 * np.sin(2 * np.pi * 0.97 * t + 0.5))
        # yaw rate tracks the actual orbital rate so the camera keeps
        # facing radially outward at any speed
        w_yaw = s_cur / r_cur
        w_b = np.array([wobble * 0.3 * np.sin(2 * np.pi * 0.45 * t + 1.0),
                        w_yaw + wobble * np.sin(2 * np.pi * 0.3 * t),
                        wobble * 0.25 * np.sin(2 * np.pi * 0.6 * t + 2.0)])
        if yaw_burst is not None:
            # pure-rotation burst (yaw rate scaled, translation unchanged):
            # a motion-model-violating fast pan, still exactly
            # IMU-consistent. Antisymmetric (xfac then x(2-fac)) so the
            # net extra yaw cancels and the camera returns to facing
            # radially outward — the loop-closure views stay comparable.
            u0, u1, fac = yaw_burst
            u = k / n_steps
            if u0 < u < u1:
                w_b[1] *= fac if u < (u0 + u1) / 2 else 2.0 - fac
        # world acceleration from the current state: centripetal for the
        # CURRENT speed/radius (keeps the near-circular orbit exact at any
        # speed) + tangential tracking of the desired speed profile +
        # a vertical bob
        p_hat = np.array([p[0], 0.0, p[2]]) / r_cur
        v_hat = (np.array([v[0], 0.0, v[2]]) / s_cur if s_cur > 1e-9
                 else np.array([1.0, 0.0, 0.0]))
        a_w = (-(s_cur * s_cur / r_cur) * p_hat
               + (8.0 * (s_des - s_cur)) * v_hat)    # ~1/8 s tracking const
        a_w[1] = 0.8 * np.sin(2 * np.pi * 0.45 * t + 0.7)   # vertical bob
        a_b = R.T @ (a_w - g)
        accs.append(a_b + true_ba)
        gyros.append(w_b + true_bg)
        t_meas.append((k + 1) * dt)
        p = p + v * dt + 0.5 * (R @ a_b + g) * dt * dt
        v = v + (R @ a_b + g) * dt
        R = R @ rodrigues(w_b * dt)
        if (k + 1) % imu_per_frame == 0:
            Rs_f.append(R.copy())
            ps_f.append(p.copy())
    accs = np.stack(accs).astype(np.float32)
    gyros = np.stack(gyros).astype(np.float32)
    t_meas = np.asarray(t_meas)
    R_wb = np.stack(Rs_f)[:n_frames]
    p_w = np.stack(ps_f)[:n_frames]
    R_cw = np.transpose(R_wb, (0, 2, 1)).astype(np.float32)
    t_cw = -np.einsum("tij,tj->ti", R_cw, p_w).astype(np.float32)
    ts = np.arange(n_frames) * imu_per_frame * dt
    windows = [None]
    for i in range(1, n_frames):
        s0, s1 = (i - 1) * imu_per_frame, i * imu_per_frame
        windows.append((accs[s0:s1], gyros[s0:s1], t_meas[s0:s1]))
    return dict(R_cw=R_cw, t_cw=t_cw, ts=ts, windows=windows,
                gravity=g, centers=p_w.astype(np.float32))


def render_stereo_pair(cam, planes, R_cw, t_cw, baseline: float):
    """Left/right rectified pair: right camera displaced along camera +x."""
    left = render_frame(cam, planes, R_cw, t_cw)
    c = -R_cw.T @ t_cw
    c_r = c + R_cw.T @ np.array([baseline, 0.0, 0.0])
    t_r = -R_cw @ c_r
    right = render_frame(cam, planes, R_cw, t_r)
    return left, right


def render_depth(cam, planes, R_cw, t_cw):
    """Exact per-pixel depth map for the planar world (z of the nearest
    rendered plane; painter's order = list order, later planes overwrite)."""
    import cv2
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    depth = np.zeros((cam.height, cam.width), np.float32)
    for pl in planes:
        h, w = pl.texture.shape
        M = np.stack([R_cw @ pl.e1, R_cw @ pl.e2, R_cw @ pl.origin + t_cw], axis=1)
        H = K @ M
        # z is affine in texture coords: z(u,v) = (R e1).z u + (R e2).z v + (R o + t).z
        uu, vv = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        zmap = (M[2, 0] * uu + M[2, 1] * vv + M[2, 2]).astype(np.float32)
        c = R_cw @ (pl.origin + pl.e1 * w / 2 + pl.e2 * h / 2) + t_cw
        if c[2] < 0.2:
            continue
        warped = cv2.warpPerspective(zmap, H, (cam.width, cam.height),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_CONSTANT,
                                     borderValue=-1.0)
        mask = warped > 0
        depth[mask] = warped[mask]
    return depth


def box_world(rng, half=8.0, tex_size=1400):
    """Four textured walls of a box in x-z (y vertical): a loop-closure
    world — a camera circling inside and facing outward revisits the first
    wall after 360 degrees."""
    ppm = tex_size / (2 * half)
    e_y = np.array([0, 1 / ppm, 0.0])
    walls = [
        # +z wall: spans x in [-half, half] at z=half
        Plane(np.array([-half, -half, half]), np.array([1 / ppm, 0, 0]), e_y,
              _texture(rng, tex_size)),
        # +x wall: spans z from half to -half
        Plane(np.array([half, -half, half]), np.array([0, 0, -1 / ppm]), e_y,
              _texture(rng, tex_size)),
        # -z wall
        Plane(np.array([half, -half, -half]), np.array([-1 / ppm, 0, 0]), e_y,
              _texture(rng, tex_size)),
        # -x wall
        Plane(np.array([-half, -half, -half]), np.array([0, 0, 1 / ppm]), e_y,
              _texture(rng, tex_size)),
    ]
    return walls


def loop_trajectory(n_frames, radius=3.0, closes: float = 1.0):
    """Circle of `closes` revolutions in the x-z plane, camera facing
    radially outward. Returns world->cam (R_cw [T,3,3], t_cw [T,3])."""
    from ..lie import so3
    import jax.numpy as jnp
    Rs, ts = [], []
    for i in range(n_frames):
        a = 2 * np.pi * closes * i / n_frames
        cw = np.array([radius * np.sin(a), 0.0, radius * np.cos(a)])
        # camera z axis points outward (radially), x to the right, y down
        z = np.array([np.sin(a), 0.0, np.cos(a)])
        x = np.array([np.cos(a), 0.0, -np.sin(a)])
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)   # columns = camera axes in world
        R_cw = R_wc.T
        t_cw = -R_cw @ cw
        Rs.append(R_cw.astype(np.float32))
        ts.append(t_cw.astype(np.float32))
    return np.stack(Rs), np.stack(ts)
