"""Per-op DEVICE profile of the deployed local-BA solve and the steady
per-frame tracking program, from a real XLA device trace (jax.profiler),
NOT cost-analysis estimates.

Settles the BASELINE.md "roofline-bound local BA" question with evidence:
for each program, prints every XLA op's measured device time, the busy sum
vs the module wall (the gap = sequential scheduling latency between ops),
and groups ops by kind. An op stream whose busy fraction is low is
latency-bound (many tiny ops paying fixed overhead), not bandwidth-bound —
no bytes/s estimate can distinguish those; the trace can.

Run on the real chip:  python scripts/profile_ba_trace.py [reps]
Writes the parsed tables to stdout and the summary dict as JSON on the
last line.
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def capture(tag, fn, *args, reps=24):
    """Trace `reps` back-to-back runs of jitted fn; return newest trace."""
    import jax
    f = jax.jit(fn)
    f(*args).block_until_ready()          # compile outside the trace
    tdir = f"/tmp/ba_trace_{tag}"
    jax.profiler.start_trace(tdir)
    for _ in range(reps):
        out = f(*args)
    out.block_until_ready()
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True),
                   key=os.path.getmtime)
    return paths[-1]


def parse(path):
    """-> (modules, ops): module executions + device-op events (TPU pid)."""
    with gzip.open(path) as f:
        tr = json.load(f)
    pids, tids = {}, {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    mods, ops = [], []
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        lane = tids.get((e["pid"], e["tid"]), "")
        if lane == "XLA Modules":
            mods.append(e)
        elif lane == "XLA Ops":
            ops.append(e)
    return mods, ops


def kind_of(name):
    n = name.lower()
    for k in ("copy", "convolution", "dot", "scatter", "gather", "while",
              "dynamic-update-slice", "dynamic-slice", "reduce", "sort",
              "iota", "broadcast", "transpose", "select", "concatenate",
              "reshape", "bitcast", "custom-call", "all-reduce", "rng"):
        if k in n:
            return k
    if "fusion" in n:
        return "fusion(elementwise/other)"
    return "other"


def exclusive_durations(ops):
    """Flame-graph accounting: each event's EXCLUSIVE time (its duration
    minus time covered by events nested inside its window) — `while` /
    `fusion` envelopes in the XLA Ops lane contain their body ops as
    separate events, so raw sums double-count."""
    evs = sorted(ops, key=lambda e: (e["ts"], -e["dur"]))
    excl = []
    stack = []  # (end_ts, index into excl)
    for e in evs:
        ts, dur = e["ts"], e["dur"]
        while stack and stack[-1][0] <= ts + 1e-9:
            stack.pop()
        excl.append([e["name"], dur])
        if stack:
            excl[stack[-1][1]][1] -= dur       # subtract from parent
        stack.append((ts + dur, len(excl) - 1))
    return excl


def profile_one(tag, fn, *args, reps=24, top=28):
    path = capture(tag, fn, *args, reps=reps)
    mods, ops = parse(path)
    if not mods:
        print(f"[{tag}] no device modules captured"); return None
    # per-module wall (median over executions)
    mdur = np.median([m["dur"] for m in mods])
    n_exec = len(mods)
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    for name, d in exclusive_durations(ops):
        per_op[name] += d
        per_op_n[name] += 1
    busy = sum(per_op.values()) / n_exec
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\n== {tag}: module wall {mdur:.1f} us/exec ({n_exec} execs), "
          f"op busy sum {busy:.1f} us/exec, "
          f"gap (sequential latency) {mdur - busy:.1f} us "
          f"({100 * (mdur - busy) / mdur:.0f}%)")
    by_kind = defaultdict(float)
    for name, tot in rows:
        by_kind[kind_of(name)] += tot / n_exec
    print("  -- by op kind (us/exec):")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"     {k:28s} {v:9.2f}  ({100 * v / mdur:5.1f}% of wall)")
    print(f"  -- top {top} ops (us/exec, count/exec):")
    for name, tot in rows[:top]:
        print(f"     {tot / n_exec:9.2f}  x{per_op_n[name] / n_exec:5.1f}  "
              f"{name[:90]}")
    return dict(tag=tag, wall_us=float(mdur), busy_us=float(busy),
                gap_us=float(mdur - busy),
                by_kind={k: float(v) for k, v in by_kind.items()})


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    import jax
    import jax.numpy as jnp
    from orb_slam3_detailed_comments_tpu.lie import SE3
    from orb_slam3_detailed_comments_tpu.models import cameras
    from orb_slam3_detailed_comments_tpu.optim import ba
    from orb_slam3_detailed_comments_tpu.pipeline import kernels
    from orb_slam3_detailed_comments_tpu.pipeline.local_mapping import (
        LocalMappingConfig, build_ba_problem)
    from orb_slam3_detailed_comments_tpu.pipeline.system import (
        MONOCULAR, System)
    from orb_slam3_detailed_comments_tpu.utils import synth_render

    # identical setup to bench.py: a real steady-state System
    cam = cameras.pinhole(fx=458.0, fy=457.0, cx=376.0, cy=240.0,
                          width=752, height=480)
    rng = np.random.default_rng(3)
    planes = synth_render.default_world(rng)
    n_warm = 45
    R, t = synth_render.orbit_trajectory(n_warm)
    slam = System(cam, MONOCULAR, enable_loop_closing=False)
    for i in range(n_warm):
        img = synth_render.render_frame(cam, planes, R[i], t[i])
        slam.track_monocular(img, i * 0.05)
    tk, m = slam.tracker, slam.map

    window = [int(k) for k in m.kf_ids()[-8:]]
    prob, bmeta = build_ba_problem(m, window, fixed=None)
    ba_iters = LocalMappingConfig.ba_iters

    def ba_kf(kf_R):
        res = ba.ba_solve(prob._replace(kf_R=kf_R), tk.cam, iters=ba_iters,
                          table_depth=bmeta["table_depth"])
        return res.kf_t.sum() + res.cost

    summaries = []
    s = profile_one("local_ba_solve", ba_kf, prob.kf_R, reps=reps)
    if s:
        s["iters"] = ba_iters
        s["note"] = (f"deployed solve = {ba_iters} LM iters; per-iter wall "
                     f"~{s['wall_us'] / ba_iters:.0f} us")
        summaries.append(s)

    # the steady frame program (same inputs as bench.py's frame_step)
    last = tk.last
    last_pts = np.unique(last.match_pt[last.match_pt >= 0])
    last_pts = last_pts[m.pt_valid[last_pts]]
    cap = m.cfg.n_feat
    ids1 = np.full(cap, -1, np.int64)
    ids1[: len(last_pts[:cap])] = last_pts[:cap]
    safe1 = np.where(ids1 >= 0, ids1, 0)
    lm_ = last.match_pt
    sel = lm_ >= 0
    last_ang = (last.angles if last.angles is not None
                else np.asarray(last.prepared.feat.angle))
    ang_of_pt = np.zeros(m.pt_valid.shape[0], np.float32)
    ang_of_pt[lm_[sel]] = last_ang[sel]
    dp, ko = m.device_points(), m.device_kf_obs()
    r1 = tk.cfg.motion_radius * tk.radius_scale
    r2 = tk.cfg.local_radius * tk.radius_scale
    statics = dict(cam=tk.cam, scale=tk.orb_cfg.scale,
                   n_levels=tk.orb_cfg.n_levels,
                   local_cap=tk.cfg.local_pts_cap)
    ids1_d = jnp.asarray(ids1, jnp.int32)
    ang1_d = jnp.asarray(ang_of_pt[safe1])
    R0, t0 = jnp.asarray(tk.last.T_cw.R), jnp.asarray(tk.last.T_cw.t)
    img0 = jnp.asarray(synth_render.render_frame(cam, planes, R[-1], t[-1]),
                       jnp.float32)

    def frame_step(img):
        prep = kernels.prepare_frame(img, cam, tk.orb_cfg)
        res = kernels.track_step_visual(
            SE3(R0, t0), prep, ids1_d, ang1_d,
            dp["xyz"], dp["desc"], dp["normal"], dp["min_dist"],
            dp["max_dist"], dp["valid"],
            ko["feat_point"], ko["valid"], ko["covis"], ko["point_bits"],
            r1, r2, tk.inv_sigma2, pt_proj8=dp.get("proj8"), **statics)
        return (res.T_cw_t.sum() + res.T_cw_R[0, 0]
                + res.n1.astype(jnp.float32)
                + (res.match_pt >= 0).sum().astype(jnp.float32))

    s = profile_one("frame_program", frame_step, img0, reps=reps)
    if s:
        summaries.append(s)
    print(json.dumps(summaries))


if __name__ == "__main__":
    main()
