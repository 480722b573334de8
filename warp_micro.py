"""Micro-bench: is take_along_axis / the routed warp slow in ISOLATION on
this chip, or only inside the fused step?  (PROFILE_r05: the warp is 429 ms
of the 458 ms step — the exact '430 ms slow-gather path' number the module
docstring recorded as the failure mode it was designed around.)

All timings fetch-forced (axon discipline).  Also captures RENDER_tpu.npz
for the renderer output diff (render_diff.py compare).
"""

import json
import time

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]   # force
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3              # ms


def main():
    import jax
    import jax.numpy as jnp

    from radarslampy_tpu.config import SlamConfig
    from radarslampy_tpu.ops.routed_warp import (
        build_routed_warp_maps, routed_polar_to_cartesian,
    )

    cfg = SlamConfig(cart_size=1024, cart_downsample=4)
    maps = build_routed_warp_maps(cfg)
    A, B = cfg.num_azimuths, cfg.polar_width_padded
    rng = np.random.default_rng(0)
    polar = jnp.asarray(rng.random((A, B), np.float32))

    res = {}

    def rec(k, v):
        res[k] = v
        print(f"{k}: {v:.3f} ms", flush=True)
        with open("WARP_MICRO_r05.json", "w") as fj:
            json.dump(res, fj, indent=2)

    # 1. the routed warp, maps as runtime args (the designed fast path)
    rec("routed_warp_ms", timeit(
        jax.jit(routed_polar_to_cartesian), polar, maps))

    # 2. ONE take_along_axis along axis 0 (the azimuth gather stage)
    ra0 = maps.ra[0]
    f = jax.jit(lambda p, i: jnp.take_along_axis(p, i, axis=0))
    rec("take_along_axis0_ms", timeit(f, polar, ra0))

    # 3. ONE take_along_axis along axis 1 on the [S, B] intermediate
    t = jnp.asarray(rng.random((cfg.cart_size, B), np.float32))
    cb = maps.cb[0]
    g = jax.jit(lambda p, i: jnp.take_along_axis(p, i, axis=1))
    rec("take_along_axis1_ms", timeit(g, t, cb))

    # 4. plain elementwise on same-size arrays (baseline sanity)
    h = jax.jit(lambda p: p * 2.0 + 1.0)
    rec("elementwise_SB_ms", timeit(h, t))

    # 5. the warp as called INSIDE slam_step: on the dequantized polar
    from radarslampy_tpu.models.frontend import _dequantize_polar

    u8 = jnp.asarray((np.asarray(polar) * 255).astype(np.uint8))
    m = jax.jit(lambda p, mp: routed_polar_to_cartesian(
        _dequantize_polar(p), mp))
    rec("dequant_plus_warp_ms", timeit(m, u8, maps))

    # 6. capture TPU renders for the renderer-diff experiment
    import render_diff

    render_diff.run("tpu")


if __name__ == "__main__":
    main()
