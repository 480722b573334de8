"""Micro-bench 2: WHAT makes the azimuth gather slow on this runtime?

warp_micro found: gather along B=3768 from [1024, 3768] is free; gather
along A=400 (either axis form) costs ~24 ms x 16 = the whole warp.  This
isolates the condition: operand-length alignment (400 vs 512/1024 padded)
and index-operand layout, each as one fetch-forced timing.
"""

import json
import time

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    np.asarray(r).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(r).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, S = 3768, 1024
    res = {}

    def rec(k, v):
        res[k] = round(v, 3)
        print(f"{k}: {v:.3f} ms", flush=True)
        with open("WARP_MICRO2_r05.json", "w") as fj:
            json.dump(res, fj, indent=2)

    g0 = jax.jit(lambda p, i: jnp.take_along_axis(p, i, axis=0))
    g1 = jax.jit(lambda p, i: jnp.take_along_axis(p, i, axis=1))

    for A in (400, 512, 1024):
        polar = jnp.asarray(rng.random((A, B), np.float32))
        idx = jnp.asarray(rng.integers(0, A, (S, B)), jnp.int32)
        rec(f"axis0_fromA{A}", timeit(g0, polar, idx))
        polar_t = jnp.asarray(np.asarray(polar).T.copy())
        idx_t = jnp.asarray(np.asarray(idx).T.copy())
        rec(f"axis1_fromA{A}_transposed", timeit(g1, polar_t, idx_t))

    # control: gather along the LONG axis (the known-fast case)
    t = jnp.asarray(rng.random((S, B), np.float32))
    cb = jnp.asarray(rng.integers(0, B, (S, S)), jnp.int32)
    rec("axis1_fromB3768_control", timeit(g1, t, cb))

    # one-hot matmul alternative for the A-axis gather, batched over column
    # blocks: out[s,b] = sum_a onehot(idx[s,b]==a) * polar[a,b] is too big,
    # but a SORTED/segmented variant may not be needed if padding fixes it.
    print("done", flush=True)


if __name__ == "__main__":
    main()
