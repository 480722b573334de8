"""Multi-device scaling benchmark: the framework's two parallel axes.

Prints one JSON line per device count for
  (a) data-parallel segment odometry (parallel/batch_odometry.py): B frame
      segments sharded over the `kf` mesh axis, one fused slam_step each, and
  (b) the distributed matrix-free pose-graph solve
      (parallel/dist_posegraph.py, method="pcg"): edges sharded, one [M,3]
      psum per CG sweep,
plus a scaling-efficiency summary  eff(n) = T(1) / (n * T(n) / n) = thr(n)/(n*thr(1)).

On real hardware the mesh axes ride ICI; in this container only one TPU chip
is reachable, so the harness defaults to the virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count).  Virtual CPU devices share
the same host cores — efficiencies here validate the *mechanics* (sharding,
collectives, parity), not hardware speedups; run on a pod for real numbers.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _setup_devices():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # Pin the platform before first device access: when a TPU PJRT plugin
    # (axon) is installed it wins platform selection and exposes one chip,
    # ignoring both env vars.  This harness is about mesh mechanics, not
    # single-chip speed — always run it on the virtual CPU mesh here.
    jax.config.update("jax_platforms", "cpu")
    return jax


def bench_posegraph(jax, n_devices: int, M: int = 2048, iters: int = 5):
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.models.posegraph import PoseGraph
    from radarslampy_tpu.parallel.dist_posegraph import optimize_pose_graph_sharded
    from radarslampy_tpu.parallel.mesh import KF_AXIS

    mesh = jax.make_mesh((n_devices,), (KF_AXIS,),
                         devices=jax.devices()[:n_devices])
    cfg = SlamConfig(pg_iterations=iters, pg_cg_iterations=256)

    rng = np.random.default_rng(0)
    th = np.linspace(0, 4 * np.pi, M)
    gt = np.stack([100 * np.cos(th), 100 * np.sin(th), th], axis=1)
    E = M
    ij = np.stack([np.arange(E), (np.arange(E) + 1) % M], axis=1).astype(np.int32)

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        return [c * d[0] + s * d[1], -s * d[0] + c * d[1],
                (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi]

    meas = np.asarray([rel(gt[i], gt[j]) for i, j in ij], np.float32)
    meas += rng.normal(0, 0.01, meas.shape).astype(np.float32)
    g = PoseGraph(
        poses=jnp.asarray(gt.astype(np.float32)),
        node_mask=jnp.ones(M, bool),
        edges_ij=jnp.asarray(ij),
        edges_meas=jnp.asarray(meas),
        edges_info=jnp.ones((E, 3), jnp.float32),
        edge_mask=jnp.ones(E, bool),
    )
    poses, cost = optimize_pose_graph_sharded(g, cfg, mesh, method="pcg")
    jax.block_until_ready(poses)  # compile
    t0 = time.perf_counter()
    poses, cost = optimize_pose_graph_sharded(g, cfg, mesh, method="pcg")
    jax.block_until_ready(poses)
    dt = time.perf_counter() - t0
    return dt, float(cost)


def bench_batch_odometry(jax, n_devices: int, frames_per_seg: int = 6):
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.models.frontend import build_frame_maps
    from radarslampy_tpu.parallel import batch_odometry as bo
    from radarslampy_tpu.parallel.mesh import KF_AXIS
    from radarslampy_tpu.sim import fakedata as fd

    mesh = jax.make_mesh((n_devices,), (KF_AXIS,),
                         devices=jax.devices()[:n_devices])
    cfg = SlamConfig(cart_size=512, cart_downsample=8, n_candidates=256,
                     anms_top_k=100, k_max=128, mds_iterations=4,
                     max_keyframes=64)  # short segments: keep MapState lean
    maps = build_frame_maps(cfg)
    rng = np.random.default_rng(0)
    world_pts, refl = fd.make_world(rng, 1200, 300.0)
    B = n_devices
    T = frames_per_seg
    scans = np.zeros(
        (B, T, cfg.num_azimuths, cfg.polar_width_padded), np.float32)
    for b in range(B):
        for t in range(T):
            pose = np.array([40.0 * b + 2.0 * t, 0.0, 0.01 * t])
            scans[b, t] = fd.render_polar_scan(world_pts, refl, pose, cfg,
                                               rng=rng, noise=0.02)
    scans = jnp.asarray(scans)

    step = bo.make_batched_step(cfg, mesh)

    def run():
        # fresh states each run: `step` donates its state argument
        s = bo.batched_init(scans[:, 0], maps, cfg)
        out = None
        for t in range(1, T):
            s, out = step(s, scans[:, t], maps)
        jax.block_until_ready(out.pose)

    run()  # compile
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return dt, B * (T - 1)


def main():
    jax = _setup_devices()
    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    results = {"posegraph": {}, "odometry": {}}

    for n in counts:
        dt, cost = bench_posegraph(jax, n)
        results["posegraph"][n] = dt
        print(json.dumps({
            "metric": f"dist pose-graph PCG solve wall-time, {n} devices",
            "value": round(dt, 4), "unit": "s", "cost": round(cost, 4),
        }))
    for n in counts:
        dt, frames = bench_batch_odometry(jax, n)
        thr = frames / dt
        results["odometry"][n] = thr
        print(json.dumps({
            "metric": f"data-parallel segment odometry, {n} devices",
            "value": round(thr, 2), "unit": "frames/s",
        }))

    thr1 = results["odometry"][counts[0]]
    eff = {
        n: round(results["odometry"][n] / (n * thr1), 3) for n in counts
    }
    print(json.dumps({
        "metric": "odometry scaling efficiency vs 1 device",
        "value": eff, "unit": "fraction",
        "note": "virtual CPU mesh shares host cores; run on a pod for HW numbers",
    }))


if __name__ == "__main__":
    main()
