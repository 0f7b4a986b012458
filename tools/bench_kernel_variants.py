"""Attribute the BEV height-placement cost (sort vs Pallas kernel) through
full-pipeline deltas — standalone timings are meaningless through the remote
relay (see tools/bench_scatter.py result, docs/PALLAS_NOTES.md).

Variants (all: full net, aux channels passed in precomputed):
  baseline   scatter_max_sorted as shipped            (sort + kernel)
  sort-only  sort runs, kernel replaced by zeros      (isolates sort)
  no-sort    kernel runs on unsorted data [WRONG OUT] (isolates kernel)
  no-op      heights = zeros                          (neither)

Usage: python tools/bench_kernel_variants.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mv3d_tpu.config import kitti_config
    from mv3d_tpu.models.mv3d_net import MV3DNet
    from mv3d_tpu.ops import voxelize, voxelize_pallas

    B, N_MEAS, N_DIST = 8, 12, 6
    base = kitti_config()
    cfg = dataclasses.replace(base, pipeline=dataclasses.replace(
        base.pipeline, use_pallas_heights=True))
    model = MV3DNet(cfg)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    n_pts = cfg.pipeline.max_points
    rng = np.random.RandomState(0)
    pts = [jax.device_put(jnp.asarray(np.stack([
        rng.uniform(0, 80, (B, n_pts)), rng.uniform(-30, 30, (B, n_pts)),
        rng.uniform(-4.2, 0.8, (B, n_pts)), rng.uniform(0, 1, (B, n_pts)),
    ], axis=-1).astype(np.float32))) for _ in range(N_DIST)]
    rgbs = [jax.device_put(jnp.asarray(
        rng.rand(B, *cfg.rgb_shape).astype(np.float32)))
        for _ in range(N_DIST)]
    t = cfg.top
    aux0 = jax.device_put(jnp.zeros((B, t.xn, t.yn, 2), jnp.float32))

    real_scatter = voxelize_pallas.scatter_max_sorted

    def make_variant(mode):
        def scatter(flat, val, n_flat, interpret=None):
            if mode == "baseline":
                return real_scatter(flat, val, n_flat)
            if mode == "no-op":
                return jnp.zeros(n_flat, jnp.float32)
            n = flat.shape[0]
            MW, TILE = voxelize_pallas._MAX_W, voxelize_pallas._TILE
            n_pad = -(-n_flat // TILE) * TILE
            n_tiles = n_pad // TILE
            flat = jnp.where(flat >= n_flat, n_pad, flat.astype(jnp.int32))
            if mode == "sort-only":
                sflat, sval = jax.lax.sort((flat, val.astype(jnp.float32)),
                                           num_keys=1)
                # fold the sorted arrays into the output without the kernel
                return jnp.zeros(n_flat, jnp.float32).at[0:n].add(sval)
            # no-sort: kernel on unsorted data (wrong results, right cost)
            sflat, sval = flat, val.astype(jnp.float32)
            sflat = jnp.concatenate([sflat, jnp.full((MW,), n_pad, jnp.int32)])
            sval = jnp.concatenate([sval, jnp.zeros((MW,), jnp.float32)])
            bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE
            starts = jnp.searchsorted(sflat[:n], bounds).astype(jnp.int32)
            n_chunks = -(-n // MW) + 1
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (TILE // 1024, 8, 128), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SMEM((MW,), jnp.int32),
                                pltpu.SMEM((MW,), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))])
            kernel = functools.partial(
                voxelize_pallas._kernel, tile_flat=TILE,
                n_chunks=int(n_chunks), max_w=MW)
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_pad // 1024, 8, 128),
                                               jnp.float32),
                interpret=False)(starts, sflat, sval)
            return out.reshape(-1)[:n_flat]
        return scatter

    def timed(name, fn, arglists):
        f = jax.jit(fn)
        out = f(*arglists[0])
        jax.block_until_ready(out)
        for i in range(2 * N_DIST):
            out = f(*arglists[i % N_DIST])
        jax.block_until_ready(out)
        t0 = time.time()
        outs = []
        for i in range(N_MEAS):
            outs.append(f(*arglists[i % N_DIST]))
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N_MEAS / B * 1000
        log(f"{name:10s} {dt:7.2f} ms/frame")
        return dt

    results = {}
    for mode in ["baseline", "sort-only", "no-sort", "no-op"]:
        voxelize_pallas.scatter_max_sorted = make_variant(mode)

        def full(variables, points, rgb, aux):
            top = voxelize.lidar_to_top_batch(points, cfg, aux=aux)
            front = voxelize.lidar_to_front_batch(points, cfg)
            dets, _ = model.forward_inference(variables, top, rgb, front,
                                              score_threshold=0.05)
            return dets.boxes3d, dets.probs, dets.mask

        results[mode] = timed(mode, full,
                              [(variables, pts[i], rgbs[i], aux0)
                               for i in range(N_DIST)])
    voxelize_pallas.scatter_max_sorted = real_scatter

    log("")
    log(f"sort cost   ~ {results['sort-only'] - results['no-op']:+.2f}")
    log(f"kernel cost ~ {results['no-sort'] - results['no-op']:+.2f}")
    log(f"heights all ~ {results['baseline'] - results['no-op']:+.2f}")
    print(results)


if __name__ == "__main__":
    main()
