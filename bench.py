"""Benchmark: frames/s/chip of the fused SLAM step at full sensor resolution.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference processes Oxford full_seq_1 at ~0.8-1.2 frames/s on an
i7-8650U (raw-roam.pdf p.5 §IV; BASELINE.md) — we use 1.0 fps as the divisor.
The benchmark drives the *device* pipeline (polar->cart warp, DoH+ANMS on
keyframe frames, KLT, clique rejection, rigid fit, motion-distortion LM,
keyframe/map update) on synthetic full-resolution scans rendered from a world
landmark model along a curved trajectory (2.5 m/frame > the 2 m keyframe gate,
so EVERY frame pays the full keyframe branch incl. DoH detection).

Measurement discipline (VERDICT.md r03 weak #1: the r03 headline was
physically impossible because `jax.block_until_ready` on the axon remote
client can return before device execution completes, even on the full output
tree):

  * Every timed path ends with a D2H FETCH of a leaf of the final state
    (`np.asarray(state.pose)`).  The states chain (donated arg), so the fetch
    cannot complete until every timed dispatch has actually executed — a
    fetch, unlike a sync, cannot lie.  The fetch is at the END of each timed
    path (mid-run D2H degrades later dispatch; end-of-run is safe).
  * per_call_sync_fps blocks after EVERY call — the per-frame latency a live
    consumer sees, and the number the remote client has never faked.
  * An analytic FLOP floor of the fused step bounds every reported number:
    fps > peak_flops / flops_per_frame is impossible, and any path violating
    it is reported as null with a note instead of as a result.  The bound
    uses the Precision.HIGHEST effective peak (~bf16/3: the 3-pass bf16
    decomposition the DoH matmuls actually run) — the raw-bf16 bound was ~3x
    too lenient to catch the round-1 class of fake number (VERDICT.md r04
    weak #7 / next #3).
  * Each path's result is PRINTED (stderr) the moment it is measured: the
    round-4 bench crashed on its last path and destroyed the two numbers it
    had already collected (BENCH_r04 rc=1).  The single stdout JSON line
    contract is unchanged.
  * The chunked path runs <= 128 frames per dispatch — the axon chip's
    per-dispatch fault cliff (chunk 512 faults, 128 runs; project memory).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# bf16 dense matmul peak FLOP/s per chip by device_kind substring
_PEAK_BF16 = (
    ("v6", 918e12),        # Trillium
    ("v5p", 459e12),
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v5litepod", 197e12),
    ("v4", 275e12),
)

# Precision.HIGHEST matmuls decompose each operand into 3 bf16 passes; the
# effective dense-matmul peak is ~1/3 of the bf16 peak.  This is the right
# impossibility bound for the DoH Toeplitz matmuls, which run HIGHEST.
_HIGHEST_PRECISION_FACTOR = 3.0


def _chip_peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


def flops_per_keyframe_frame(cfg) -> float:
    """Analytic FLOP count of the dominant (MXU) work in one keyframe frame.

    DoH scale space (ops/pallas/doh_pallas.py): per sigma, TWO [S,S]x[S,S]
    Toeplitz-blur matmuls at 2*S^3 FLOPs each -> n_sigma * 4 * S^3.
    S=1024, 3 sigmas => ~12.9 GFLOP.  Everything else (routed warp gathers,
    KLT patch solves, LM normal equations) is orders of magnitude smaller, so
    this is a *lower bound* — which is the right direction for an
    impossibility check (true fps <= peak / floor >= peak / true_flops).
    """
    S = cfg.cart_size
    return len(cfg.doh_sigmas) * 4.0 * float(S) ** 3


def main():
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.models import frontend
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.sim import fakedata as fd

    cfg = SlamConfig()
    maps = build_frame_maps(cfg)
    rng = np.random.default_rng(0)

    # synthetic curved trajectory at realistic speed (~10 m/s, 4 Hz);
    # 2.5 m/frame keeps every frame past the 2 m keyframe gate
    n_warm, n_meas = 4, 200          # >=200 measured frames (VERDICT r03 #2)
    T = n_warm + n_meas + 1
    poses = np.zeros((T, 3))
    v, w = 10.0 * cfg.scan_period_s, 0.03
    for t in range(1, T):
        th = poses[t - 1, 2]
        poses[t] = poses[t - 1] + [v * np.cos(th), v * np.sin(th), w]

    world_pts, world_refl = fd.make_world_corridor(
        rng, poses, cfg.max_range_clip_m, per_scan=120.0
    )
    scans = [
        jnp.asarray(
            fd.render_polar_scan(world_pts, world_refl, p, cfg, rng=rng,
                                 noise=0.02)
        )
        for p in poses
    ]

    init = jax.jit(lambda p, m: frontend.init_state(p, jnp.zeros(3), m, cfg))
    step = jax.jit(
        lambda s, p, m: frontend.slam_step(s, p, m, cfg), donate_argnums=(0,)
    )

    flops_frame = flops_per_keyframe_frame(cfg)
    dev = jax.devices()[0]
    peak = _chip_peak_flops(dev)
    peak_eff = (peak / _HIGHEST_PRECISION_FACTOR) if peak else None
    # fps above this is physically impossible on this chip: the DoH matmuls
    # run Precision.HIGHEST, whose effective peak is ~bf16/3
    fps_bound = (peak_eff / flops_frame) if peak_eff else None

    def check(fps):
        """None out numbers above the chip's FLOP-floor bound."""
        if fps_bound is not None and fps > fps_bound:
            return None
        return round(fps, 3)

    def partial(name, fps):
        """Emit a path's number the moment it exists (crash insurance —
        BENCH_r04 died on its last path with two good numbers unprinted)."""
        print(f"# measured {name}: {fps:.2f} fps"
              + ("" if check(fps) is not None else
                 f"  [IMPOSSIBLE > bound {fps_bound:.0f} -> null]"),
              file=sys.stderr, flush=True)

    # warm-up + one tiny early fetch: switches the axon client into its
    # reliable synchronous-fetch mode before anything is timed (a FIRST
    # fetch after a long async run can hang; project memory)
    state = init(scans[0], maps)
    for i in range(1, n_warm + 1):
        state, out = step(state, scans[i], maps)
    np.asarray(state.pose)

    # --- per-call-sync path: block after EVERY step (live latency) ---------
    t0 = time.perf_counter()
    for i in range(n_warm + 1, n_warm + 1 + n_meas):
        state, out = step(state, scans[i], maps)
        jax.block_until_ready((state, out))
    np.asarray(state.pose)                      # fetch-forced completion
    fps_sync = n_meas / (time.perf_counter() - t0)
    partial("per_call_sync", fps_sync)

    # --- async per-dispatch path: one dispatch per frame, fetch at end -----
    state_a = init(scans[0], maps)
    for i in range(1, n_warm + 1):
        state_a, out = step(state_a, scans[i], maps)
    np.asarray(state_a.pose)
    t0 = time.perf_counter()
    for i in range(n_warm + 1, n_warm + 1 + n_meas):
        state_a, out = step(state_a, scans[i], maps)
    np.asarray(state_a.pose)                    # states chain: forces ALL
    fps_async = n_meas / (time.perf_counter() - t0)
    partial("per_dispatch_async", fps_async)

    # --- chunked path: <=128 frames per dispatch via lax.scan --------------
    # chunk_f = 100 keeps each dispatch on the safe side of the axon chip's
    # per-dispatch fault cliff (128 runs, 512 faults); the r04 bench shipped
    # all 200 frames as ONE dispatch and crashed the worker (BENCH_r04 rc=1)
    chunk_f = 100
    n_chunks = n_meas // chunk_f
    chunk = jax.jit(
        lambda s, ps, m: frontend.slam_step_chunk(s, ps, m, cfg),
        donate_argnums=(0,),
    )
    batches = [
        jnp.stack(scans[n_warm + 1 + k * chunk_f
                        : n_warm + 1 + (k + 1) * chunk_f])
        for k in range(n_chunks)
    ]
    state_c = init(scans[0], maps)
    state_c, outs = chunk(state_c, batches[0], maps)      # compile + warm
    np.asarray(state_c.pose)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        for b in batches:
            state_c, outs = chunk(state_c, b, maps)  # chained via donated state
    np.asarray(state_c.pose)                    # fetch forces every rep
    fps_chunked = reps * n_chunks * chunk_f / (time.perf_counter() - t0)
    partial("chunked", fps_chunked)

    mfu = (flops_frame * fps_chunked / peak_eff) if peak_eff else None

    headline = check(fps_chunked)
    result = {
        "metric": "frames/s/chip (fused SLAM step, 400x2025 polar -> 1024^2 "
                  "cart @0.173m/px; every frame takes the keyframe branch; "
                  "chunked, completion forced by D2H fetch of chained state)",
        "value": headline if headline is not None else check(fps_sync),
        "unit": "frames/s",
        "vs_baseline": round((headline or fps_sync) / 1.0, 3),
        "per_call_sync_fps": check(fps_sync),
        "per_dispatch_fps": check(fps_async),
        "chunked_fps": headline,
        "chunk_frames": chunk_f,
        "measured_frames": n_meas,
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "flops_per_frame_model": flops_frame,
        "flop_model": "DoH Toeplitz blurs only (n_sigma*4*S^3) — lower "
                      "bound; see bench.flops_per_keyframe_frame",
        "chip_peak_bf16_flops": peak,
        "chip_peak_highest_precision_flops": peak_eff,
        "fps_upper_bound_flop_model": (round(fps_bound, 1)
                                       if fps_bound else None),
        "mfu_vs_highest_precision_peak": (round(mfu, 4)
                                          if mfu is not None else None),
        "mfu_note": "MFU and the impossibility bound use the "
                    "Precision.HIGHEST effective peak (~bf16/3) — the "
                    "precision the DoH matmuls actually run; the raw-bf16 "
                    "bound was ~3x too lenient to catch impossible numbers "
                    "(VERDICT.md r04 weak #7)",
        "blocking": "every timed path ends in np.asarray(state.pose) — a D2H "
                    "fetch of the chained (donated) state that cannot "
                    "complete before all timed dispatches executed; "
                    "block_until_ready alone proved unreliable on the axon "
                    "remote client (VERDICT.md r03 weak #1)",
    }
    if headline is None:
        result["invalid_measurement_note"] = (
            f"chunked fps {fps_chunked:.0f} exceeds the FLOP-floor bound "
            f"{fps_bound:.0f} — reported null; per_call_sync used as value"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
