"""Micro-study: where do the 5 ms/frame of the BEV height placement go?

Times, with large materialized outputs (to defeat the remote relay's
early-ack of small-output executions, docs/PALLAS_NOTES.md):

  xla-scatter    jnp .at[flat].max(val) into the dense 12M volume
  pallas         scatter_max_sorted (sort + searchsorted + kernel)
  sort+write     jax.lax.sort + a contiguous dense write (the floor without
                 any scatter: sort cost + 48MB output traffic)
  write-only     broadcast write of the dense volume (pure bandwidth floor)

Usage: python tools/bench_scatter.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mv3d_tpu.config import kitti_config
    from mv3d_tpu.ops.voxelize_pallas import scatter_max_sorted

    cfg = kitti_config()
    t = cfg.top
    n_flat = t.xn * t.yn * t.zn
    n = cfg.pipeline.max_points
    B = args.batch
    N_DIST = 4
    rng = np.random.RandomState(0)
    log(f"devices: {jax.devices()} n={n} n_flat={n_flat} batch={B}")

    flats = [jax.device_put(jnp.asarray(
        rng.randint(0, n_flat, (B, n)).astype(np.int32)))
        for _ in range(N_DIST)]
    vals = [jax.device_put(jnp.asarray(
        rng.rand(B, n).astype(np.float32))) for _ in range(N_DIST)]

    def timed(name, fn):
        f = jax.jit(fn)
        out = f(flats[0], vals[0])
        jax.block_until_ready(out)
        for i in range(2 * N_DIST):
            out = f(flats[i % N_DIST], vals[i % N_DIST])
        jax.block_until_ready(out)
        t0 = time.time()
        outs = []
        for i in range(args.iters):
            outs.append(f(flats[i % N_DIST], vals[i % N_DIST]))
            if len(outs) > 2:
                outs.pop(0)
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / args.iters / B * 1000
        log(f"{name:12s} {dt:7.3f} ms/frame")
        return dt

    timed("write-only", lambda f, v: jax.vmap(
        lambda fi, vi: jnp.full((n_flat,), vi[0]))(f, v))

    timed("sort+write", lambda f, v: jax.vmap(
        lambda fi, vi: jnp.zeros(n_flat, jnp.float32).at[0:n].set(
            jax.lax.sort((fi, vi), num_keys=1)[1]))(f, v))

    timed("sort-only", lambda f, v: jax.vmap(
        lambda fi, vi: jax.lax.sort((fi, vi), num_keys=1)[1])(f, v))

    timed("xla-scatter", lambda f, v: jax.vmap(
        lambda fi, vi: jnp.zeros(n_flat + 1, jnp.float32)
        .at[fi].max(vi)[:n_flat])(f, v))

    timed("pallas", lambda f, v: jax.vmap(
        lambda fi, vi: scatter_max_sorted(fi, vi, n_flat))(f, v))


if __name__ == "__main__":
    main()
