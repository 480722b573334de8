"""The fused per-frame SLAM step: one jitted XLA program per radar frame.

This is the TPU-native inversion of the reference's serial object-mutating loop
(`RawROAMSystem.run`, `RawROAMSystem.py:94-298`; `Tracker.track`,
`Tracker.py:35-106`).  Instead of Python orchestration crossing into OpenCV,
MINPACK and networkx several times per frame, the *entire* pipeline —

    polar warp -> KLT tracking -> consistency outlier rejection -> rigid fit ->
    motion-distortion LM -> pose update -> keyframe decision -> map write ->
    feature re-detection & refill (only when triggered)

— runs as a single compiled program over an explicit `SlamState` pytree with
static shapes.  Data-dependent decisions (keyframe, retrack) are `lax.cond`
branches, so feature detection cost is only paid on keyframe frames, exactly as
the reference only re-detects on retrack (`RawROAMSystem.py:250-271`) — but with
no host round-trip.

Coordinate conventions (kept bit-compatible in spirit with the reference):
  * Cartesian image: sensor at the centre pixel; local metric coords are
    (px - centre) * cart_resolution_m with image axes used directly as the
    world axes (the reference's convention, `Mapping.py:72-95`).
  * Pose [x, y, theta] world; T = pose_to_transform(pose) maps local -> world.

Deliberate fixes over the reference (documented, SURVEY.md §7 quirks):
  * the rigid fit runs on sensor-centred *metric* coordinates; the reference
    fits raw corner-origin pixel coords and rescales only h
    (`Tracker.py:108-127`), silently folding a centre-offset into h.
  * keyframe rotation gating wraps the angle difference (`Mapping.py:162-164`
    compares raw theta).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from typing import NamedTuple as _NamedTuple

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.placerecog import scan_context
from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.ops.features import Candidates, get_features, merge_features
from radarslampy_tpu.ops.fmt import estimate_rotation_fmt
from radarslampy_tpu.ops.grid import GridMaps, build_grid_maps, polar_to_cartesian
from radarslampy_tpu.ops.motion import solve_motion, undistort
from radarslampy_tpu.ops.robust import reject_outliers
from radarslampy_tpu.ops.routed_warp import (
    RoutedWarpMaps,
    build_routed_warp_maps,
    routed_polar_to_cartesian,
)
from radarslampy_tpu.ops import trig
from radarslampy_tpu.ops.tracking import track_klt


class FrameMaps(_NamedTuple):
    """All static resample maps the per-frame step needs.

    MUST be passed through jit as a runtime argument, not a closure constant:
    XLA lowers gathers whose index operands are compile-time constants onto a
    ~1000x slower path (see ops/routed_warp.py).
    """

    grid: GridMaps          # log-polar + reference bilinear maps
    routed: RoutedWarpMaps  # fast routed polar->cart warp
    doh: jax.Array          # [n_sigma, S, S] Toeplitz blur operators for DoH


def build_frame_maps(cfg: SlamConfig) -> FrameMaps:
    from radarslampy_tpu.ops.pallas.doh_pallas import build_doh_mats

    return FrameMaps(
        grid=build_grid_maps(cfg),
        routed=build_routed_warp_maps(cfg),
        doh=build_doh_mats(cfg),
    )


class MapState(NamedTuple):
    """Preallocated keyframe store (replaces `Map`/`Keyframe`, Mapping.py:21-206).

    Fixed capacity `max_keyframes`; a monotone cursor marks the live prefix.
    Sharding-ready: every field is a dense array whose leading axis is the
    keyframe dimension (see parallel/sharded_map.py).
    """

    poses: jax.Array        # [M, 3] keyframe world poses
    feat_world: jax.Array   # [M, K, 2] feature world positions (undistorted, m)
    feat_local: jax.Array   # [M, K, 2] undistorted sensor-frame coords (m)
    feat_ids: jax.Array     # [M, K] int32 persistent landmark ids (-1 = none)
    feat_mask: jax.Array    # [M, K]
    velocities: jax.Array   # [M, 3]
    cursor: jax.Array       # int32 — number of live keyframes
    descriptors: jax.Array  # [M, R, S] scan-context place-recognition signatures
    pc_local: jax.Array     # [M, P, 2] dense peak point cloud, sensor-local m
                            # (the per-keyframe cloud of Mapping.py:62, stored
                            # undistorted — M2DP's intended input)
    pc_mask: jax.Array      # [M, P]
    # [M] int32 creating-frame index per keyframe (-1 = empty slot).  Lets the
    # evaluator associate keyframes to GT by *frame index* instead of by
    # nearest estimated position, which mismatches near revisits once the
    # online backend has re-anchored poses (VERDICT.md r03 weak #6).  Defaults
    # to None so externally-built toy maps stay valid pytrees.
    frame_ids: jax.Array = None


class SlamState(NamedTuple):
    pose: jax.Array         # [3] current world pose
    velocity: jax.Array     # [3] current body velocity (m/s, rad/s)
    prev_polar: jax.Array   # [A, Wp] previous polar scan (for FMT)
    prev_cart: jax.Array    # [S, S] previous Cartesian image (KLT source)
    feat_px: jax.Array      # [K, 2] tracked feature coords in prev_cart (x, y px)
    feat_mask: jax.Array    # [K]
    feat_id: jax.Array      # [K] int32 persistent landmark id per slot (-1 free)
    next_id: jax.Array      # int32 monotone landmark id counter
    feat_world: jax.Array   # [K, 2] keyframe-anchored world positions (p_w)
    kf_pose: jax.Array      # [3] pose of the last keyframe
    map: MapState
    frame_idx: jax.Array    # int32


class StepOutput(NamedTuple):
    pose: jax.Array         # [3]
    velocity: jax.Array     # [3]
    n_tracked: jax.Array    # int32 — features surviving KLT
    n_inliers: jax.Array    # int32 — features surviving outlier rejection
    is_keyframe: jax.Array  # bool
    did_retrack: jax.Array  # bool
    fmt_rotation: jax.Array # float — FMT rotation estimate (diagnostic)
    fit_ok: jax.Array       # bool — rigid fit had enough points
    fmt_scale: jax.Array    # float — FMT log-polar scale estimate (~1.0 rigid)


def _px_to_metric(px, cfg: SlamConfig):
    return (px - cfg.cart_center) * cfg.cart_resolution_m


def _metric_to_px(m, cfg: SlamConfig):
    return m / cfg.cart_resolution_m + cfg.cart_center


def empty_map(cfg: SlamConfig, dtype=jnp.float32) -> MapState:
    M, K = cfg.max_keyframes, cfg.k_max
    return MapState(
        poses=jnp.zeros((M, 3), dtype),
        feat_world=jnp.zeros((M, K, 2), dtype),
        feat_local=jnp.zeros((M, K, 2), dtype),
        feat_ids=jnp.full((M, K), -1, jnp.int32),
        feat_mask=jnp.zeros((M, K), dtype=bool),
        velocities=jnp.zeros((M, 3), dtype),
        cursor=jnp.int32(0),
        descriptors=jnp.zeros((M, cfg.sc_rings, cfg.sc_sectors), dtype),
        pc_local=jnp.zeros((M, cfg.pc_points_per_kf, 2), dtype),
        pc_mask=jnp.zeros((M, cfg.pc_points_per_kf), dtype=bool),
        frame_ids=jnp.full((M,), -1, jnp.int32),
    )


def keyframe_pointcloud(polar, velocity, cfg: SlamConfig):
    """Dense sensor-local point cloud for a keyframe (Mapping.py:62).

    `extract_pointcloud` finds per-azimuth power peaks (getPointCloud.py:11-52);
    the strongest `pc_points_per_kf` across the whole scan are kept, converted
    from (azimuth row, range bin) to metric (x, y) and motion-undistorted with
    the current velocity — the reference stores its keyframe clouds precisely
    "for computing descriptors like M2DP" and this is that input.
    """
    from radarslampy_tpu.ops.pointcloud import extract_pointcloud

    pc = extract_pointcloud(polar, cfg)
    A, P = pc.range_idx.shape
    phi = (jnp.arange(A, dtype=polar.dtype) * (2.0 * jnp.pi / A))[:, None]
    r = pc.range_idx * cfg.range_resolution_m
    # image-frame convention shared with the Cartesian warp (grid.py:52-54):
    # x along phi=0, y along phi=pi/2 (image row axis)
    sphi, cphi = trig.sin_cos(phi)
    pts = jnp.stack([r * cphi, r * sphi], axis=-1)  # [A, P, 2]
    flat_pts = pts.reshape(A * P, 2)
    score = jnp.where(pc.mask, pc.power, -jnp.inf).reshape(A * P)
    vals, idx = jax.lax.top_k(score, cfg.pc_points_per_kf)
    keep = jnp.isfinite(vals)
    sel = flat_pts[idx]
    sel = undistort(velocity, sel, cfg.scan_period_s)
    return jnp.where(keep[:, None], sel, 0.0), keep


def assign_new_ids(old_mask, new_mask, old_ids, next_id):
    """Give fresh persistent landmark ids to newly-filled feature slots.

    Slots that just became valid get consecutive ids starting at `next_id`;
    surviving slots keep theirs; free slots stay -1.
    """
    fresh = new_mask & ~old_mask
    rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1
    ids = jnp.where(fresh, next_id + rank, jnp.where(new_mask, old_ids, -1))
    return ids.astype(jnp.int32), next_id + jnp.sum(fresh.astype(jnp.int32))


def _features_to_world(px, mask, pose, velocity, cfg: SlamConfig):
    """Local pixel features -> (undistorted local metric, world positions)
    (Keyframe ctor, Mapping.py:58-66 + convertFeaturesLocalToGlobal
    Mapping.py:72-95)."""
    local = _px_to_metric(px, cfg)
    und = undistort(velocity, local, cfg.scan_period_s)
    T = geo.pose_to_transform(pose)
    world = und @ T[:2, :2].T + T[:2, 2]
    keep = mask[:, None]
    return jnp.where(keep, und, 0.0), jnp.where(keep, world, 0.0)


def _write_keyframe(m: MapState, pose, feat_world, feat_local, feat_ids,
                    feat_mask, velocity, descriptor, pc_local,
                    pc_mask, frame_idx) -> MapState:
    c = jnp.minimum(m.cursor, m.poses.shape[0] - 1)
    upd = jax.lax.dynamic_update_index_in_dim
    return MapState(
        poses=upd(m.poses, pose, c, 0),
        feat_world=upd(m.feat_world, feat_world, c, 0),
        feat_local=upd(m.feat_local, feat_local, c, 0),
        feat_ids=upd(m.feat_ids, feat_ids, c, 0),
        feat_mask=upd(m.feat_mask, feat_mask, c, 0),
        velocities=upd(m.velocities, velocity, c, 0),
        cursor=jnp.minimum(m.cursor + 1, jnp.int32(m.poses.shape[0])),
        descriptors=upd(m.descriptors, descriptor, c, 0),
        pc_local=upd(m.pc_local, pc_local, c, 0),
        pc_mask=upd(m.pc_mask, pc_mask, c, 0),
        frame_ids=upd(m.frame_ids, jnp.int32(frame_idx), c, 0),
    )


def _dequantize_polar(polar):
    """Accept raw u8 PNG power bytes and dequantize on device (u8/255 is the
    exact decode math of parseData.py:43); 4x less host->device traffic than
    shipping float32."""
    if jnp.issubdtype(polar.dtype, jnp.integer):
        return polar.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return polar


def init_state(polar0, init_pose, maps: FrameMaps, cfg: SlamConfig) -> SlamState:
    """First-frame initialisation (RawROAMSystem.py:143-160): detect features,
    anchor them at the initial pose, write keyframe 0."""
    polar0 = _dequantize_polar(polar0)
    cart = routed_polar_to_cartesian(polar0, maps.routed)
    cands = get_features(cart, cfg, maps.doh)
    K = cfg.k_max
    coords = jnp.zeros((K, 2), cart.dtype)
    mask = jnp.zeros((K,), dtype=bool)
    coords, mask = merge_features(coords, mask, cands)
    ids, next_id = assign_new_ids(
        jnp.zeros(K, dtype=bool), mask, jnp.full(K, -1, jnp.int32), jnp.int32(0)
    )

    pose = jnp.asarray(init_pose, cart.dtype)
    vel = jnp.zeros(3, cart.dtype)
    feat_local, feat_world = _features_to_world(coords, mask, pose, vel, cfg)
    pc_pts, pc_ok = keyframe_pointcloud(polar0, vel, cfg)
    m = _write_keyframe(
        empty_map(cfg, cart.dtype), pose, feat_world, feat_local, ids, mask, vel,
        scan_context(polar0, cfg), pc_pts, pc_ok, jnp.int32(0),
    )
    return SlamState(
        pose=pose,
        velocity=vel,
        prev_polar=polar0,
        prev_cart=cart,
        feat_px=coords,
        feat_mask=mask,
        feat_id=ids,
        next_id=next_id,
        feat_world=feat_world,
        kf_pose=pose,
        map=m,
        frame_idx=jnp.int32(0),
    )


def slam_step_chunk(state: SlamState, polars, maps: FrameMaps, cfg: SlamConfig):
    """F radar frames through the pipeline in ONE compiled program.

    `polars`: [F, A, Wpad] (u8 or float).  lax.scan over `slam_step` — the
    per-frame work is identical, but a chunk pays ONE dispatch instead of F.
    On the axon remote-TPU client dispatch costs ~100 µs/call while the fused
    step's device time is ~10-15 µs, so chunking is worth ~10x wall-clock
    (see PROFILE_r02.json).  Returns (state, StepOutput stacked [F, ...]).
    Offline/throughput use — per-frame latency consumers (live viz, online
    backend) should keep the per-frame path.
    """

    def body(s, polar):
        s2, out = slam_step(s, polar, maps, cfg)
        return s2, out

    return jax.lax.scan(body, state, polars)


def slam_step(state: SlamState, polar, maps: FrameMaps, cfg: SlamConfig):
    """One radar frame through the full pipeline.  Pure; jit with static cfg,
    maps passed as a runtime argument."""
    polar = _dequantize_polar(polar)
    cart = routed_polar_to_cartesian(polar, maps.routed)

    # ---- FMT rotation + log-polar scale estimate (gated; the reference
    # computes-and-ignores rotation and never wires scale at all) ----
    if cfg.use_fmt:
        fmt = estimate_rotation_fmt(state.prev_polar, polar, cfg,
                                    grid=maps.grid)
        fmt_rot = fmt.rot_rad
        fmt_scale = fmt.scale
    else:
        fmt_rot = jnp.zeros((), cart.dtype)
        fmt_scale = jnp.ones((), cart.dtype)

    # ---- KLT tracking (Tracker.py:76-91) ----
    # With use_fmt the FMT rotation seeds the LK search as an initial flow
    # (the scene rotates by fmt_rot about the sensor pixel): fast turns whose
    # pixel motion exceeds the pyramid's reach stay tracked.  The reference
    # computed exactly this estimate and threw it away (Tracker.py:62-72).
    if cfg.use_fmt:
        sR, cR = trig.sin_cos(fmt_rot)
        d = state.feat_px - cfg.cart_center
        pred = jnp.stack(
            [cR * d[:, 0] - sR * d[:, 1], sR * d[:, 0] + cR * d[:, 1]],
            axis=-1,
        ) + cfg.cart_center
        init_flow = pred - state.feat_px
    else:
        init_flow = None
    tr = track_klt(state.prev_cart, cart, state.feat_px, state.feat_mask, cfg,
                   init_flow=init_flow)
    n_tracked = jnp.sum(tr.status.astype(jnp.int32))

    # ---- geometric consistency outlier rejection (Tracker.py:93-95) ----
    # Improvement over the reference (which runs the clique on raw distorted
    # pixels): pre-correct both point sets with the last velocity estimate
    # before the consistency test.  Scan distortion alone shifts points by up
    # to |v|*T/2 (~1 m at city speeds), which at a 0.5 m pair-distance gate
    # falsely rejects a third of honest tracks.
    prev_local = _px_to_metric(state.feat_px, cfg)
    curr_local = _px_to_metric(tr.coords, cfg)
    prev_und = undistort(state.velocity, prev_local, cfg.scan_period_s)
    curr_und = undistort(state.velocity, curr_local, cfg.scan_period_s)
    prev_und_px = prev_und / cfg.cart_resolution_m
    curr_und_px = curr_und / cfg.cart_resolution_m
    rej = reject_outliers(prev_und_px, curr_und_px, tr.status, cfg)
    live = rej.inlier_mask
    n_inliers = rej.n_inliers

    # ---- rigid fit on sensor-centred metric coords (fix of Tracker.py:108-127) --
    w = live.astype(cart.dtype)
    R, h, fit_ok = geo.procrustes_masked(prev_und, curr_und, w)
    # convention: R curr + h = prev  => (R, h) is the relative motion curr -> prev.
    # Compose the world-pose guess in well-conditioned difference form (small
    # delta rotated into world, not a 3x3 product — float32 trig care).
    dth = trig.atan2(R[1, 0], R[0, 0])
    s0, c0 = trig.sin_cos(state.pose[2])
    pose_init = jnp.stack(
        [
            state.pose[0] + c0 * h[0] - s0 * h[1],
            state.pose[1] + s0 * h[0] + c0 * h[1],
            state.pose[2] + dth,
        ]
    )

    # ---- motion-distortion LM refinement (RawROAMSystem.py:208-214) ----
    sol = solve_motion(state.pose, state.feat_world, curr_local, pose_init, live, cfg)
    use_sol = sol.ok & fit_ok
    pose_meas = jnp.where(use_sol, sol.pose, pose_init)
    vel_meas = jnp.where(use_sol, sol.velocity, state.velocity)

    # ---- degenerate-fit gate: coast on constant velocity (r05) ----
    # Below min_inliers_accept the rigid fit is unconstrained; accepting it
    # anchors the next keyframe at a garbage pose.  Full-seq evidence
    # (DRIFT_ANALYSIS.md): frames with 2-8 inliers produced 8-22 deg
    # single-frame heading jumps that dominated the 9 km ATE, while >99% of
    # frames tracked at 0.2-0.5% drift.  Dead-reckon one frame instead
    # (retrack refills features immediately after).
    Tp = cfg.scan_period_s
    pose_cv = jnp.stack(
        [
            state.pose[0] + (c0 * state.velocity[0] - s0 * state.velocity[1]) * Tp,
            state.pose[1] + (s0 * state.velocity[0] + c0 * state.velocity[1]) * Tp,
            state.pose[2] + state.velocity[2] * Tp,
        ]
    )
    confident = n_inliers >= cfg.min_inliers_accept
    pose = jnp.where(confident, pose_meas, pose_cv)
    velocity = jnp.where(confident, vel_meas, state.velocity)
    fit_ok = fit_ok & confident

    # ---- keyframe decision (Mapping.py:149-174 + RawROAMSystem.py:250-253) ----
    retrack = n_inliers <= cfg.n_features_before_retrack
    dth = jnp.abs(geo.wrap_angle(pose[2] - state.kf_pose[2]))
    dtrans2 = jnp.sum((pose[:2] - state.kf_pose[:2]) ** 2)
    kf_good = (dth >= cfg.kf_rot_threshold_rad) | (
        dtrans2 >= cfg.kf_trans_threshold_m**2
    )
    make_kf = retrack | kf_good

    def keyframe_branch(op):
        coords, mask_in, pose_, vel_, m_ = op

        def do_retrack(cm):
            c_, m2 = cm
            cands = get_features(cart, cfg, maps.doh)
            return merge_features(c_, m2, cands)

        coords2, mask2 = jax.lax.cond(
            retrack, do_retrack, lambda cm: cm, (coords, mask_in)
        )
        ids2, next2 = assign_new_ids(mask_in, mask2, state.feat_id, state.next_id)
        fl, fw = _features_to_world(coords2, mask2, pose_, vel_, cfg)
        pc_pts, pc_ok = keyframe_pointcloud(polar, vel_, cfg)
        m2_ = _write_keyframe(m_, pose_, fw, fl, ids2, mask2, vel_,
                              scan_context(polar, cfg), pc_pts, pc_ok,
                              state.frame_idx + 1)
        return coords2, mask2, ids2, next2, fw, pose_, m2_

    def plain_branch(op):
        coords, mask_in, pose_, vel_, m_ = op
        # keep anchoring to the old keyframe; world coords unchanged
        return (coords, mask_in, state.feat_id, state.next_id,
                state.feat_world, state.kf_pose, m_)

    (coords_out, mask_out, ids_out, next_id_out, feat_world_out, kf_pose_out,
     map_out) = jax.lax.cond(
        make_kf,
        keyframe_branch,
        plain_branch,
        (tr.coords, live, pose, velocity, state.map),
    )

    new_state = SlamState(
        pose=pose,
        velocity=velocity,
        prev_polar=polar,
        prev_cart=cart,
        feat_px=coords_out,
        feat_mask=mask_out,
        feat_id=ids_out,
        next_id=next_id_out,
        feat_world=feat_world_out,
        kf_pose=kf_pose_out,
        map=map_out,
        frame_idx=state.frame_idx + 1,
    )
    out = StepOutput(
        pose=pose,
        velocity=velocity,
        n_tracked=n_tracked,
        n_inliers=n_inliers,
        is_keyframe=make_kf,
        did_retrack=retrack,
        fmt_rotation=fmt_rot,
        fit_ok=fit_ok,
        fmt_scale=fmt_scale,
    )
    return new_state, out
