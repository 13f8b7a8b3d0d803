#!/usr/bin/env python
"""IMU calibration preprocessing: synchronize raw accelerometer/gyroscope
streams and estimate the noise parameters the settings YAML needs.

TPU-repo equivalent of the reference's calibration helper
(Examples/Calibration/python_scripts/process_imu.py), which interpolates the
accelerometer onto gyroscope timestamps and writes a EuRoC-format imu0.csv.
This version vectorizes the sync (np.interp per axis instead of a per-sample
loop) and adds Allan-deviation estimation of the continuous-time noise
density and bias random walk — the IMU.NoiseAcc/NoiseGyro/WalkAcc/WalkGyro
values consumed by utils/config.py — from a static recording.

Usage:
    python scripts/process_imu.py <dir>            # sync + write imu0.csv
    python scripts/process_imu.py --allan <imu0.csv>

<dir> layout (reference recorder format): IMU/acc.txt, IMU/gyro.txt as
"t,x,y,z" rows (t in seconds), optional cam0/times.txt.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def sync_acc_to_gyro(acc: np.ndarray, gyro: np.ndarray) -> np.ndarray:
    """acc/gyro [N,4] rows (t, x, y, z) -> synchronized [M,7] rows
    (t, gx, gy, gz, ax, ay, az) on gyro timestamps, acc linearly
    interpolated; gyro samples outside the acc time span are dropped."""
    tg, ta = gyro[:, 0], acc[:, 0]
    keep = (tg >= ta[0]) & (tg <= ta[-1])
    tg = tg[keep]
    out = np.empty((len(tg), 7))
    out[:, 0] = tg
    out[:, 1:4] = gyro[keep, 1:4]
    for j in range(3):
        out[:, 4 + j] = np.interp(tg, ta, acc[:, 1 + j])
    return out


def allan_deviation(x: np.ndarray, dt: float, n_taus: int = 40):
    """Overlapping Allan deviation of a 1-D signal sampled at 1/dt Hz.
    Returns (taus [s], adev) over a log-spaced range of cluster times."""
    N = len(x)
    theta = np.cumsum(x) * dt                      # integrated signal
    max_m = N // 3
    ms = np.unique(np.logspace(0, np.log10(max(max_m, 2)),
                               n_taus).astype(int))
    ms = ms[(ms >= 1) & (ms <= max_m)]
    taus = ms * dt
    adev = np.empty(len(ms))
    for i, m in enumerate(ms):
        d = theta[2 * m:] - 2 * theta[m:-m] + theta[:-2 * m]
        adev[i] = np.sqrt((d ** 2).mean() / (2.0 * taus[i] ** 2))
    return taus, adev


def estimate_noise_params(meas: np.ndarray, dt: float):
    """Estimate (noise_density, random_walk) for each axis of a static
    [N, 3] measurement block via Allan deviation:

      - noise density sigma_n [unit/sqrt(Hz)]: white noise contributes
        adev^2(tau) = sigma_n^2 / tau,
      - bias random walk sigma_w [unit*sqrt(Hz)]: contributes
        adev^2(tau) = sigma_w^2 * tau / 3
        (reference yamls, e.g. Examples/Monocular-Inertial/EuRoC.yaml, carry
        exactly these two IMU.Noise*/IMU.Walk* constants).

    Both are recovered by a joint relative-error least-squares fit of
    adev^2(tau) over the whole tau range (a point readout at a fixed tau
    would be biased wherever the other component still dominates).

    Returns (sigma_n [3], sigma_w [3])."""
    sig_n = np.empty(3)
    sig_w = np.empty(3)
    for j in range(3):
        x = meas[:, j] - meas[:, j].mean()
        taus, adev = allan_deviation(x, dt)
        av2 = adev ** 2
        A = np.stack([1.0 / taus, taus / 3.0], 1) / av2[:, None]
        coef, *_ = np.linalg.lstsq(A, np.ones(len(taus)), rcond=None)
        sig_n[j] = np.sqrt(max(coef[0], 0.0))
        sig_w[j] = np.sqrt(max(coef[1], 0.0))
    return sig_n, sig_w


def write_euroc_csv(path: str, sync: np.ndarray):
    with open(path, "w") as f:
        f.write("#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
                "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
                "a_RS_S_z [m s^-2]\n")
        for row in sync:
            f.write(f"{int(round(1e9 * row[0]))}," +
                    ",".join(f"{v:.9f}" for v in row[1:]) + "\n")


def main():
    args = [a for a in sys.argv[1:] if a != "--allan"]
    if "--allan" in sys.argv:
        data = np.loadtxt(args[0], delimiter=",", skiprows=1)
        t = data[:, 0] * 1e-9
        dt = float(np.median(np.diff(t)))
        gn, gw = estimate_noise_params(data[:, 1:4], dt)
        an, aw = estimate_noise_params(data[:, 4:7], dt)
        print(f"# from {len(t)} samples at {1 / dt:.1f} Hz (static recording)")
        print(f"IMU.NoiseGyro: {gn.mean():.6g}   # rad/s/sqrt(Hz)")
        print(f"IMU.NoiseAcc: {an.mean():.6g}    # m/s^2/sqrt(Hz)")
        print(f"IMU.GyroWalk: {gw.mean():.6g}    # rad/s^2/sqrt(Hz)")
        print(f"IMU.AccWalk: {aw.mean():.6g}     # m/s^3/sqrt(Hz)")
        return
    d = args[0]
    acc = np.loadtxt(os.path.join(d, "IMU", "acc.txt"), delimiter=",")
    gyro = np.loadtxt(os.path.join(d, "IMU", "gyro.txt"), delimiter=",")
    sync = sync_acc_to_gyro(acc, gyro)
    out = os.path.join(d, "imu0.csv")
    write_euroc_csv(out, sync)
    print(f"wrote {len(sync)} synchronized rows to {out}")


if __name__ == "__main__":
    main()
