"""Per-stage device profile of the fused SLAM step (VERDICT.md weak #7).

Times each pipeline stage as its own jitted program on the current JAX
backend (the real TPU chip under axon; CPU with --cpu), on REAL Oxford tiny
frames, and reports median wall time per stage plus the fused full step.
Per-stage times do not simply add up to the fused step — XLA fuses
elementwise work into neighbours and overlaps — but they rank where the
microseconds go, which is what a "which kernel next" decision needs
(SURVEY.md §7: is a Pallas KLT worth building?).

CLI: python -m radarslampy_tpu.utils.profile_stages [--cpu] [--out FILE]
Writes a JSON artifact: {"stages": {name: {"us": median_us}}, ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time_fn(fn, *args, iters: int = 50, warmup: int = 5):
    """Median wall seconds of fn(*args) with device sync (includes dispatch)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _pipelined_time(fn, args, iters: int = 200, trials: int = 5):
    """Seconds per invocation under pipelined async dispatch.

    `iters` back-to-back dispatches with ONE final sync — the same
    methodology as bench.py, so per-stage numbers are comparable with the
    headline frames/s.  Executions queue in submission order on the device,
    so syncing the last output awaits them all.  (A lax.scan-looped variant
    was tried and abandoned: under the axon remote client, scan bodies
    containing the routed gathers lower onto a catastrophically slow path,
    and pre-D2H timings under-report — see VERDICT round-1 notes on D2H
    poisoning.)  NOTE: this includes amortised dispatch, so it is an upper
    bound on pure device time.
    """
    import jax

    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def profile(cfg=None, data_root: str = "/root/reference/data",
            iters: int = 50) -> dict:
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.io import oxford
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.models.placerecog import scan_context
    from radarslampy_tpu.ops import geometry as geo
    from radarslampy_tpu.ops.features import get_features
    from radarslampy_tpu.ops.motion import solve_motion, undistort
    from radarslampy_tpu.ops.robust import reject_outliers
    from radarslampy_tpu.ops.routed_warp import routed_polar_to_cartesian
    from radarslampy_tpu.ops.tracking import track_klt

    cfg = cfg or SlamConfig()
    maps = build_frame_maps(cfg)

    seq = oxford.sequence_paths(data_root, "tiny")
    paths = oxford.radar_image_paths(seq["radar"], seq["timestamps"])[:2]
    f0, f1 = [oxford.decode_radar_png(p, cfg, raw_u8=True) for p in paths]
    polar0 = jnp.asarray(f0.power)
    polar1 = jnp.asarray(f1.power)

    # realistic intermediate state from the actual pipeline
    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(lambda s, p, m: frontend.slam_step(s, p, m, cfg))
    state = init(polar0, maps)
    cart0 = state.prev_cart
    state1, _ = step(state, polar1, maps)
    cart1 = state1.prev_cart
    coords, mask = state.feat_px, state.feat_mask

    deq = jax.jit(frontend._dequantize_polar)
    klt = jax.jit(lambda a, b, co, mk: track_klt(a, b, co, mk, cfg))
    tr = klt(cart0, cart1, coords, mask)

    def _reject(prev_px, curr_px, status, vel):
        pu = undistort(vel, frontend._px_to_metric(prev_px, cfg),
                       cfg.scan_period_s) / cfg.cart_resolution_m
        cu = undistort(vel, frontend._px_to_metric(curr_px, cfg),
                       cfg.scan_period_s) / cfg.cart_resolution_m
        return reject_outliers(pu, cu, status, cfg)

    rej_fn = jax.jit(_reject)
    rej = rej_fn(coords, tr.coords, tr.status, state.velocity)

    def _fit_and_motion(prev_px, curr_px, live, vel, pose, feat_world):
        pu = undistort(vel, frontend._px_to_metric(prev_px, cfg), cfg.scan_period_s)
        cu = undistort(vel, frontend._px_to_metric(curr_px, cfg), cfg.scan_period_s)
        w = live.astype(cu.dtype)
        R, h, ok = geo.procrustes_masked(pu, cu, w)
        dth = jnp.arctan2(R[1, 0], R[0, 0])
        c0, s0 = jnp.cos(pose[2]), jnp.sin(pose[2])
        pose_init = jnp.stack([
            pose[0] + c0 * h[0] - s0 * h[1],
            pose[1] + s0 * h[0] + c0 * h[1],
            pose[2] + dth,
        ])
        cl = frontend._px_to_metric(curr_px, cfg)
        return solve_motion(pose, feat_world, cl, pose_init, live, cfg)

    fpolar1 = deq(polar1)  # float input for perturbable loop timing

    stages = {}
    stages["polar_to_cart_warp"] = _pipelined_time(
        lambda p, m: routed_polar_to_cartesian(p, m), (fpolar1, maps.routed))
    stages["doh_detect_anms"] = _pipelined_time(
        lambda c, d: get_features(c, cfg, d), (cart1, maps.doh))
    stages["klt_pyramidal"] = _pipelined_time(
        lambda a, b, co, mk: track_klt(a, b, co, mk, cfg),
        (cart0, cart1, coords, mask))
    stages["clique_reject"] = _pipelined_time(
        lambda cu, pv, st, v: _reject(pv, cu, st, v),
        (tr.coords, coords, tr.status, state.velocity))
    stages["procrustes_motion_lm"] = _pipelined_time(
        lambda cu, pv, lv, v, po, fw: _fit_and_motion(pv, cu, lv, v, po, fw),
        (tr.coords, coords, rej.inlier_mask, state.velocity, state.pose,
         state.feat_world))
    stages["scan_context"] = _pipelined_time(
        lambda p: scan_context(p, cfg), (fpolar1,))
    stages["keyframe_pointcloud"] = _pipelined_time(
        lambda p, v: frontend.keyframe_pointcloud(p, v, cfg),
        (fpolar1, state.velocity))

    # fused step: chain the SlamState through pipelined dispatches,
    # alternating two real frames (exactly how the driver runs it)
    import jax as _jax

    s_run, _ = step(state, polar1, maps)
    _jax.block_until_ready(s_run.pose)
    ts = []
    for _ in range(5):
        s_run = state
        t0 = time.perf_counter()
        for i in range(200):
            s_run, _out = step(s_run, polar1 if i % 2 else polar0, maps)
        _jax.block_until_ready(_out.pose)
        ts.append(time.perf_counter() - t0)
    stages["fused_slam_step"] = float(np.median(ts)) / 200

    # dispatch-inclusive wall time of one fused call, for the end-to-end view
    wall_step = _time_fn(
        lambda s, p, m: step(s, p, m)[1].pose, state, polar1, maps,
        iters=iters)

    dev = jax.devices()[0]
    return {
        "platform": dev.platform,
        "device": str(dev.device_kind),
        "cart_size": cfg.cart_size,
        "iters": iters,
        "stages": {k: {"us": round(v * 1e6, 1)} for k, v in stages.items()},
        "sum_of_stages_us": round((sum(stages.values())
                                   - stages["fused_slam_step"]) * 1e6, 1),
        "fused_step_us": round(stages["fused_slam_step"] * 1e6, 1),
        "fused_step_wall_us_incl_dispatch": round(wall_step * 1e6, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default=None)
    a = ap.parse_args(argv)
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = profile(iters=a.iters)
    print(json.dumps(res, indent=2))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(res, f, indent=2)
    return res


if __name__ == "__main__":
    main()
