"""Bundle adjustment: SE(2) keyframe poses + 2-D landmarks, Schur complement.

The reference only scaffolds BA on g2o (`PoseGraphLib.py:46-98`: SBA cameras,
marginalised landmark vertices, Huber kernel, CSparse) and never runs it
(SURVEY.md §2#12).  This is the TPU-native design the BASELINE.json north star
names: Gauss-Newton over (poses, landmarks) where the landmark blocks are
*marginalised in closed form* — every landmark contributes an independent 2x2
block, inverted in parallel — leaving a reduced [3M, 3M] pose system solved by
damped Cholesky.  Landmark/observation work is embarrassingly parallel and is
what shards across the `kf` mesh axis in parallel/dist_ba.py.

Problem construction (`build_ba_problem`) is host-side: it walks the dense
MapState, groups observations by persistent landmark id (assigned by the
frontend), keeps landmarks seen from >= 2 keyframes, and packs everything into
fixed-shape masked tensors.  The solve is one jitted program.

Observation model: a keyframe at pose T observes landmark l at local
coordinates  z = R(theta)^T (l - t);  residual r = z_obs - z(T, l), Huber
robust-weighted.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from radarslampy_tpu.config import SlamConfig
from radarslampy_tpu.models.frontend import MapState
from radarslampy_tpu.ops import geometry as geo
from radarslampy_tpu.ops import trig


class BAProblem(NamedTuple):
    poses: jax.Array       # [M, 3] initial keyframe poses
    pose_mask: jax.Array   # [M]
    landmarks: jax.Array   # [L, 2] initial landmark world positions
    lm_mask: jax.Array     # [L]
    obs_pose: jax.Array    # [O] int32 keyframe index per observation
    obs_lm: jax.Array      # [O] int32 landmark index per observation
    obs_xy: jax.Array      # [O, 2] observed local (sensor-frame) coords
    obs_mask: jax.Array    # [O]


def build_ba_problem(map_state: MapState, min_views: int = 2,
                     max_landmarks: int | None = None,
                     max_obs: int | None = None) -> BAProblem:
    """Host-side packing: dense MapState -> masked BA tensors.

    Landmark ids were assigned by the frontend (`frontend.assign_new_ids`); a
    landmark observed from >= `min_views` keyframes becomes a BA variable, with
    its initial position the mean of its per-view world estimates.
    """
    M = int(map_state.cursor)
    ids = np.asarray(map_state.feat_ids)[:M]       # [M, K]
    mask = np.asarray(map_state.feat_mask)[:M]
    local = np.asarray(map_state.feat_local)[:M]
    world = np.asarray(map_state.feat_world)[:M]
    poses = np.asarray(map_state.poses)[:M]

    mm, kk = np.nonzero(mask & (ids >= 0))
    obs_id = ids[mm, kk]
    uniq, inv, counts = np.unique(obs_id, return_inverse=True, return_counts=True)
    keep_lm = counts >= min_views
    keep_obs = keep_lm[inv]

    mm, kk, inv = mm[keep_obs], kk[keep_obs], inv[keep_obs]
    # compact landmark indexing over kept ids
    kept_ids = uniq[keep_lm]
    remap = -np.ones(len(uniq), np.int64)
    remap[np.nonzero(keep_lm)[0]] = np.arange(keep_lm.sum())
    lm_idx = remap[inv]

    L = int(keep_lm.sum())
    lm_init = np.zeros((L, 2))
    np.add.at(lm_init, lm_idx, world[mm, kk])
    lm_counts = np.bincount(lm_idx, minlength=L)[:, None]
    lm_init /= np.maximum(lm_counts, 1)

    O = len(mm)
    Mpad = M
    Lpad = max_landmarks or max(L, 1)
    Opad = max_obs or max(O, 1)
    assert L <= Lpad and O <= Opad

    def pad(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    return BAProblem(
        poses=jnp.asarray(poses.astype(np.float32)),
        pose_mask=jnp.ones(Mpad, dtype=bool),
        landmarks=jnp.asarray(pad(lm_init.astype(np.float32), Lpad)),
        lm_mask=jnp.asarray(np.arange(Lpad) < L),
        obs_pose=jnp.asarray(pad(mm.astype(np.int32), Opad)),
        obs_lm=jnp.asarray(pad(lm_idx.astype(np.int32), Opad)),
        obs_xy=jnp.asarray(pad(local[mm, kk].astype(np.float32), Opad)),
        obs_mask=jnp.asarray(np.arange(Opad) < O),
    )


def _obs_residual(pose, lm, z):
    """r = z - R(theta)^T (lm - t), difference form."""
    s, c = trig.sin_cos(pose[2])
    d = lm - pose[:2]
    pred = jnp.stack([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
    return z - pred


def _obs_blocks(pose, lm, z, huber_delta):
    r = _obs_residual(pose, lm, z)
    Jp = jax.jacfwd(lambda p: _obs_residual(p, lm, z))(pose)   # [2,3]
    Jl = jax.jacfwd(lambda l: _obs_residual(pose, l, z))(lm)   # [2,2]
    e = jnp.sqrt(jnp.sum(r * r) + 1e-12)
    w = jnp.where(e <= huber_delta, 1.0, huber_delta / e)
    return r, Jp, Jl, w


def ba_cost(poses, landmarks, p: BAProblem, huber_delta: float):
    r = jax.vmap(_obs_residual)(poses[p.obs_pose], landmarks[p.obs_lm], p.obs_xy)
    e = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    w = jnp.where(e <= huber_delta, 1.0, huber_delta / e)
    m = p.obs_mask.astype(poses.dtype)
    return jnp.sum(w * m * jnp.sum(r * r, axis=-1))


def build_view_table(p: BAProblem, max_views: int):
    """[L, V] table: observation indices of each landmark (padded -1)."""
    L = p.landmarks.shape[0]
    V = max_views
    order = jnp.argsort(p.obs_lm * jnp.int32(1) + (~p.obs_mask) * jnp.int32(10**6))
    lm_sorted = p.obs_lm[order]
    valid_sorted = p.obs_mask[order]
    same_as_prev = jnp.concatenate(
        [jnp.array([False]), lm_sorted[1:] == lm_sorted[:-1]]
    ) & valid_sorted

    def rank_scan(carry, s):
        r = jnp.where(s, carry + 1, 0)
        return r, r

    _, ranks = jax.lax.scan(rank_scan, jnp.int32(0), same_as_prev)
    view_table = jnp.full((L, V), -1, jnp.int32)
    ok_entry = valid_sorted & (ranks < V)
    return view_table.at[
        jnp.where(ok_entry, lm_sorted, L - 1), jnp.where(ok_entry, ranks, V - 1)
    ].set(jnp.where(ok_entry, order.astype(jnp.int32), -1), mode="drop")


def schur_blocks(poses, landmarks, p: BAProblem, hd, lam, n_poses=None):
    """Per-LM-iteration Schur ingredients WITHOUT any dense [M,M] structure.

    Returns (Hpp [M,3,3] block-diagonal pose Hessian, bs [M,3] reduced rhs,
    Hinv [L,2,2] damped landmark-block inverses, bl [L,2], U [O,3,2] coupling
    blocks).  Pure sum over this problem's observations/landmarks — a sharded
    caller psums Hpp/bs across landmark shards (O(M) vectors, not O(M^2)
    matrices) and the result is exactly the single-device system.
    """
    dtype = poses.dtype
    M = n_poses or poses.shape[0]
    L = landmarks.shape[0]
    r, Jp, Jl, w = jax.vmap(_obs_blocks, in_axes=(0, 0, 0, None))(
        poses[p.obs_pose], landmarks[p.obs_lm], p.obs_xy, hd
    )
    w = w * p.obs_mask.astype(dtype)
    wr = w[:, None] * r
    Hpp = jnp.zeros((M, 3, 3), dtype).at[p.obs_pose].add(
        jnp.einsum("oab,oac->obc", Jp, w[:, None, None] * Jp)
    )
    bp = jnp.zeros((M, 3), dtype).at[p.obs_pose].add(
        jnp.einsum("oab,oa->ob", Jp, wr)
    )
    Hll = jnp.zeros((L, 2, 2), dtype).at[p.obs_lm].add(
        jnp.einsum("oab,oac->obc", Jl, w[:, None, None] * Jl)
    )
    bl = jnp.zeros((L, 2), dtype).at[p.obs_lm].add(
        jnp.einsum("oab,oa->ob", Jl, wr)
    )
    # damped landmark blocks, closed-form 2x2 inverse
    Hll_d = Hll + (lam * ((Hll[:, 0, 0] + Hll[:, 1, 1]) * 0.5) + 1e-8)[
        :, None, None
    ] * jnp.eye(2, dtype=dtype)[None]
    det = Hll_d[:, 0, 0] * Hll_d[:, 1, 1] - Hll_d[:, 0, 1] * Hll_d[:, 1, 0]
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    Hinv = (
        jnp.stack(
            [
                jnp.stack([Hll_d[:, 1, 1], -Hll_d[:, 0, 1]], -1),
                jnp.stack([-Hll_d[:, 1, 0], Hll_d[:, 0, 0]], -1),
            ],
            -2,
        )
        / det[:, None, None]
    ) * p.lm_mask[:, None, None].astype(dtype)

    U = jnp.einsum("oab,oac->obc", Jp, w[:, None, None] * Jl)  # [O,3,2]
    bs = bp.at[p.obs_pose].add(
        -jnp.einsum("oab,obc,oc->oa", U, Hinv[p.obs_lm], bl[p.obs_lm])
    )
    return Hpp, bs, Hinv, bl, U


def schur_reduced_system(poses, landmarks, p: BAProblem, view_table, hd, lam,
                         n_poses=None):
    """Assemble the DENSE Schur-reduced pose system from this problem's
    observations (cross-pose fill-in enumerated via `view_table`, exact for
    landmarks with <= V views).

    Returns (H [3M,3M] *without* anchor/damping, bs [M,3], Hinv [L,2,2],
    bl [L,2], U [O,3,2]).  O(M^2) memory — small problems only; the
    matrix-free path (`_optimize_ba_pcg`) applies the same operator via
    per-observation gathers/scatters and never materialises it
    (VERDICT.md r02 weak #3).
    """
    dtype = poses.dtype
    M = n_poses or poses.shape[0]
    V = view_table.shape[1]
    Hpp, bs, Hinv, bl, U = schur_blocks(poses, landmarks, p, hd, lam,
                                        n_poses=n_poses)

    vt_ok = view_table >= 0
    vt_safe = jnp.maximum(view_table, 0)
    U_l = U[vt_safe] * vt_ok[..., None, None]          # [L, V, 3, 2]
    pose_l = p.obs_pose[vt_safe]                        # [L, V]
    A = jnp.einsum("lvab,lbc->lvac", U_l, Hinv)
    C = jnp.einsum("lvab,lucb->lvuac", A, U_l)          # [L,V,V,3,3]
    Hb = jnp.zeros((M, M, 3, 3), dtype)
    rows = pose_l[:, :, None].repeat(V, 2).reshape(-1)
    cols = pose_l[:, None, :].repeat(V, 1).reshape(-1)
    Hb = Hb.at[rows, cols].add(-C.reshape(-1, 3, 3))
    Hb = Hb.at[jnp.arange(M), jnp.arange(M)].add(Hpp)
    H = Hb.transpose(0, 2, 1, 3).reshape(3 * M, 3 * M)
    return H, bs, Hinv, bl, U


def solve_reduced(H, bs, lam, dtype):
    """Anchor pose 0, damp, Cholesky-solve the reduced pose system."""
    M3 = H.shape[0]
    anchor = jnp.zeros(M3, dtype).at[:3].set(1e8)
    H = H + jnp.diag(anchor + lam * (jnp.diag(H) + 1e-9))
    return -jax.scipy.linalg.solve(H, bs.reshape(-1), assume_a="pos").reshape(-1, 3)


def back_substitute_landmarks(Hinv, bl, U, delta_p, p: BAProblem):
    """dl = -Hinv (bl + Hlp dp); (Hlp dp)_l = sum_{o in l} U_o^T dp_{m(o)}."""
    L = bl.shape[0]
    Hlp_dp = jnp.zeros((L, 2), bl.dtype).at[p.obs_lm].add(
        jnp.einsum("oab,oa->ob", U, delta_p[p.obs_pose])
    )
    return -jnp.einsum("lab,lb->la", Hinv, bl + Hlp_dp)


def optimize_ba(p: BAProblem, cfg: SlamConfig, max_views_per_landmark: int = 8,
                method: str = "auto"):
    """Fixed-budget LM bundle adjustment with Schur-complement reduction.

    `method`:
      * "dense" — materialise the reduced [3M, 3M] pose system (cross-pose
        fill-in enumerated up to `max_views_per_landmark` views) and
        Cholesky-solve.  Exact for small maps, O(M^2) memory.
      * "pcg"   — matrix-free: the reduced operator
        (Hpp - U Hll^-1 U^T + anchor + damping) v is applied via
        per-observation gathers/scatters and solved with block-Jacobi PCG —
        O(O + M) memory per sweep, EXACT for all view counts (no V bound).
        This is how BA runs at full_seq_1 scale (M ~ 4.5-8k keyframes, 50k+
        landmarks), where the dense reduced system alone would be ~0.7 TB
        (VERDICT.md r02 weak #3).  HOST-DRIVEN at bounded dispatch size: one
        jit call per LM linearisation / per <= cfg.pg_sweeps_per_dispatch CG
        sweeps.  Round 4's full-sequence run crashed the TPU worker inside
        the old single-dispatch variant (all LM iterations x up-to-8M sweeps
        as one device program) — the per-dispatch fault cliff this bound is
        for (VERDICT.md r04 next #5).
      * "auto"  — dense when M <= 512 else pcg.

    float32 matmul precision: see optimize_pose_graph (models/posegraph.py) —
    the TPU MXU's reduced-precision default stalls the anchored reduced solve.
    """
    if method == "auto":
        method = "dense" if p.poses.shape[0] <= 512 else "pcg"
    if method == "pcg":
        return _optimize_ba_pcg_hostloop(p, cfg)
    return _optimize_ba_dense_jit(p, cfg, max_views_per_landmark)


@partial(jax.jit, static_argnames=("cfg", "max_views_per_landmark"))
def _optimize_ba_dense_jit(p, cfg, max_views_per_landmark):
    with jax.default_matmul_precision("float32"):
        return _optimize_ba(p, cfg, max_views_per_landmark)


@jax.jit
def _ba_lm_prepare(poses, landmarks, lam, hd, p: BAProblem):
    """One BA LM iteration's Schur ingredients + initial CG state on the
    reduced pose system (see `_optimize_ba_pcg` for the math)."""
    with jax.default_matmul_precision("float32"):
        dtype = poses.dtype
        M = poses.shape[0]
        eye3 = jnp.eye(3, dtype=dtype)
        fix = jnp.zeros(M, dtype).at[0].set(1e8)
        Hpp, bs, Hinv, bl, U = schur_blocks(poses, landmarks, p, hd, lam)
        UHU = jnp.zeros((M, 3, 3), dtype).at[p.obs_pose].add(
            jnp.einsum("oab,obc,odc->oad", U, Hinv[p.obs_lm], U)
        )
        S_diag = Hpp - UHU
        sdiag = jnp.diagonal(S_diag, axis1=1, axis2=2)
        damp = lam * (sdiag + 1e-9)
        P = S_diag + fix[:, None, None] * eye3 + jax.vmap(jnp.diag)(damp)
        Pinv = jnp.linalg.inv(P)
        x0 = jnp.zeros((M, 3), dtype)
        r0 = -bs
        z0 = jnp.einsum("mab,mb->ma", Pinv, r0)
        rz0 = jnp.sum(r0 * z0)
        cg = (jnp.int32(0), x0, r0, z0, z0, rz0)
        return Hpp, Hinv, bl, U, damp, Pinv, cg, rz0


@partial(jax.jit, static_argnames=("k_max",), donate_argnums=(0,))
def _ba_cg_slice(cg, Hpp, Hinv, U, damp, Pinv, p: BAProblem, n_cg, rz0,
                 k_max: int):
    """<= k_max PCG sweeps on the Schur-reduced pose system."""
    with jax.default_matmul_precision("float32"):
        dtype = damp.dtype
        M = damp.shape[0]
        L = Hinv.shape[0]
        fix = jnp.zeros(M, dtype).at[0].set(1e8)

        def Afun(v):
            t = jnp.zeros((L, 2), dtype).at[p.obs_lm].add(
                jnp.einsum("oab,oa->ob", U, v[p.obs_pose])
            )
            s = jnp.einsum("lab,lb->la", Hinv, t)
            Uv = jnp.zeros((M, 3), dtype).at[p.obs_pose].add(
                jnp.einsum("oab,ob->oa", U, s[p.obs_lm])
            )
            return (jnp.einsum("mab,mb->ma", Hpp, v) - Uv
                    + fix[:, None] * v + damp * v)

        def Minv(v):
            return jnp.einsum("mab,mb->ma", Pinv, v)

        def cond(c):
            k, (it, x, rr, z, pk, rz) = c
            return (k < k_max) & (it < n_cg) & (rz > 1e-10 * rz0) & (rz > 1e-20)

        def body(c):
            k, (it, x, rr, z, pk, rz) = c
            Ap = Afun(pk)
            pAp = jnp.sum(pk * Ap)
            ok = pAp > 1e-30
            alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
            x = x + alpha * pk
            rr = rr - alpha * Ap
            z = Minv(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(ok, rz_new / rz, 0.0)
            pk = z + beta * pk
            return (k + 1, (it + 1, x, rr, z, pk, rz_new))

        _, cg = jax.lax.while_loop(cond, body, (jnp.int32(0), cg))
        return cg


@jax.jit
def _ba_lm_accept(poses, landmarks, lam, cost, delta_p, Hinv, bl, U, hd,
                  p: BAProblem):
    with jax.default_matmul_precision("float32"):
        delta_l = back_substitute_landmarks(Hinv, bl, U, delta_p, p)
        cand_p = poses + delta_p
        cand_p = cand_p.at[:, 2].set(geo.wrap_angle(cand_p[:, 2]))
        cand_l = landmarks + delta_l
        new_cost = ba_cost(cand_p, cand_l, p, hd)
        accept = new_cost < cost
        poses = jnp.where(accept, cand_p, poses)
        landmarks = jnp.where(accept, cand_l, landmarks)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7)
        )
        return poses, landmarks, lam, cost


@jax.jit
def _ba_cost_jit(poses, landmarks, p: BAProblem, hd):
    with jax.default_matmul_precision("float32"):
        return ba_cost(poses, landmarks, p, hd)


def _optimize_ba_pcg_hostloop(p: BAProblem, cfg: SlamConfig):
    """Matrix-free Schur BA with every device dispatch bounded (same iterate
    sequence as `_optimize_ba_pcg`; parity-tested in test_ba)."""
    dtype = p.poses.dtype
    M = p.poses.shape[0]
    K = max(1, int(getattr(cfg, "pg_sweeps_per_dispatch", 4096)))
    n_cg = jnp.int32(cfg.pg_cg_iterations or 8 * M)
    hd = jnp.asarray(cfg.pg_huber_delta, dtype)
    poses, landmarks = p.poses, p.landmarks
    lam = jnp.asarray(1e-3, dtype)
    cost = _ba_cost_jit(poses, landmarks, p, hd)
    for _ in range(cfg.pg_iterations):
        Hpp, Hinv, bl, U, damp, Pinv, cg, rz0 = _ba_lm_prepare(
            poses, landmarks, lam, hd, p
        )
        rz0_h = float(rz0)
        while True:
            cg = _ba_cg_slice(cg, Hpp, Hinv, U, damp, Pinv, p, n_cg, rz0,
                              k_max=K)
            # ONE D2H round trip per slice decides continuation on the host
            it_h, rz_h = jax.device_get((cg[0], cg[5]))
            if (it_h >= int(n_cg)) or (rz_h <= 1e-10 * rz0_h) or (rz_h <= 1e-20):
                break
        poses, landmarks, lam, cost = _ba_lm_accept(
            poses, landmarks, lam, cost, cg[1], Hinv, bl, U, hd, p
        )
    return poses, landmarks, cost


def _optimize_ba_pcg(p: BAProblem, cfg: SlamConfig, reduce_fn=None):
    """Matrix-free LM bundle adjustment (see `optimize_ba(method="pcg")`).

    The reduced pose system S = Hpp - U Hll^-1 U^T is never materialised:
      S v  =  Hpp_m v_m  -  sum_{o in m} U_o (Hll^-1)_{l(o)} t_{l(o)},
      t_l  =  sum_{o in l} U_o^T v_{m(o)}
    — two scatter-adds + batched small matmuls per application, O(O).
    Preconditioner: the EXACT block diagonal of S (one more scatter-add),
    inverted as batched 3x3.

    `reduce_fn` sums landmark-shard-parallel contributions across devices
    (identity on one device; `lax.psum` in parallel/dist_ba.py).  Only
    [M,3]-or-[M,3,3]-sized arrays ever cross shards — the O(M^2) psum of the
    dense path is gone.
    """
    if reduce_fn is None:
        reduce_fn = lambda x: x
    hd = cfg.pg_huber_delta
    dtype = p.poses.dtype
    M = p.poses.shape[0]
    L = p.landmarks.shape[0]
    eye3 = jnp.eye(3, dtype=dtype)
    fix = jnp.zeros(M, dtype).at[0].set(1e8)  # gauge anchor on pose 0

    def lm_step(carry, _):
        poses, landmarks, lam, cost = carry
        Hpp, bs, Hinv, bl, U = schur_blocks(poses, landmarks, p, hd, lam)
        Hpp = reduce_fn(Hpp)
        bs = reduce_fn(bs)
        # exact block diagonal of U Hll^-1 U^T (per-pose scatter)
        UHU = reduce_fn(
            jnp.zeros((M, 3, 3), dtype).at[p.obs_pose].add(
                jnp.einsum("oab,obc,odc->oad", U, Hinv[p.obs_lm], U)
            )
        )
        S_diag = Hpp - UHU                                   # [M,3,3]
        sdiag = jnp.diagonal(S_diag, axis1=1, axis2=2)       # [M,3]
        damp = lam * (sdiag + 1e-9)

        def Afun(v):  # (S + anchor + damping) v,  v [M,3]
            t = jnp.zeros((L, 2), dtype).at[p.obs_lm].add(
                jnp.einsum("oab,oa->ob", U, v[p.obs_pose])
            )
            s = jnp.einsum("lab,lb->la", Hinv, t)
            Uv = reduce_fn(
                jnp.zeros((M, 3), dtype).at[p.obs_pose].add(
                    jnp.einsum("oab,ob->oa", U, s[p.obs_lm])
                )
            )
            return (jnp.einsum("mab,mb->ma", Hpp, v) - Uv
                    + fix[:, None] * v + damp * v)

        P = S_diag + fix[:, None, None] * eye3 + jax.vmap(jnp.diag)(damp)
        Pinv = jnp.linalg.inv(P)

        def Minv(v):
            return jnp.einsum("mab,mb->ma", Pinv, v)

        x0 = jnp.zeros((M, 3), dtype)
        r0 = -bs
        z0 = Minv(r0)
        rz0 = jnp.sum(r0 * z0)
        # 8M auto cap: the Schur system inherits the pose graph's chain
        # structure, and a 2M block-Jacobi PCG cap measurably truncates LM
        # steps when weights are uneven (see posegraph.py).
        n_cg = cfg.pg_cg_iterations or 8 * M

        def cg_cond(c):
            it, x, rr, z, pk, rz = c
            return (it < n_cg) & (rz > 1e-10 * rz0) & (rz > 1e-20)

        def cg_body(c):
            it, x, rr, z, pk, rz = c
            Ap = Afun(pk)
            pAp = jnp.sum(pk * Ap)
            ok = pAp > 1e-30
            alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
            x = x + alpha * pk
            rr = rr - alpha * Ap
            z = Minv(rr)
            rz_new = jnp.sum(rr * z)
            beta = jnp.where(ok, rz_new / rz, 0.0)
            pk = z + beta * pk
            return (it + 1, x, rr, z, pk, rz_new)

        _, delta_p, *_ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.int32(0), x0, r0, z0, z0, rz0)
        )
        delta_l = back_substitute_landmarks(Hinv, bl, U, delta_p, p)

        cand_p = poses + delta_p
        cand_p = cand_p.at[:, 2].set(geo.wrap_angle(cand_p[:, 2]))
        cand_l = landmarks + delta_l
        new_cost = reduce_fn(ba_cost(cand_p, cand_l, p, hd))
        accept = new_cost < cost
        poses = jnp.where(accept, cand_p, poses)
        landmarks = jnp.where(accept, cand_l, landmarks)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7)
        )
        return (poses, landmarks, lam, cost), None

    init_cost = reduce_fn(ba_cost(p.poses, p.landmarks, p, hd))
    (poses, landmarks, _, cost), _ = jax.lax.scan(
        lm_step,
        (p.poses, p.landmarks, jnp.asarray(1e-3, dtype), init_cost),
        None,
        length=cfg.pg_iterations,
    )
    return poses, landmarks, cost


def _optimize_ba(p: BAProblem, cfg: SlamConfig, max_views_per_landmark: int = 8):
    hd = cfg.pg_huber_delta
    dtype = p.poses.dtype
    view_table = build_view_table(p, max_views_per_landmark)

    def lm_step(carry, _):
        poses, landmarks, lam, cost = carry
        H, bs, Hinv, bl, U = schur_reduced_system(
            poses, landmarks, p, view_table, hd, lam
        )
        delta_p = solve_reduced(H, bs, lam, dtype)
        delta_l = back_substitute_landmarks(Hinv, bl, U, delta_p, p)

        cand_p = poses + delta_p
        cand_p = cand_p.at[:, 2].set(geo.wrap_angle(cand_p[:, 2]))
        cand_l = landmarks + delta_l
        new_cost = ba_cost(cand_p, cand_l, p, hd)
        accept = new_cost < cost
        poses = jnp.where(accept, cand_p, poses)
        landmarks = jnp.where(accept, cand_l, landmarks)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 8.0, 1e7)
        )
        return (poses, landmarks, lam, cost), None

    init_cost = ba_cost(p.poses, p.landmarks, p, hd)
    (poses, landmarks, _, cost), _ = jax.lax.scan(
        lm_step,
        (p.poses, p.landmarks, jnp.asarray(1e-3, dtype), init_cost),
        None,
        length=cfg.pg_iterations,
    )
    return poses, landmarks, cost
