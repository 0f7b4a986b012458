"""Pallas TPU kernel: sorted segment scatter-max for the BEV height channels.

Why: the dense height volume is (cells * slices) = 12M f32 (48 MB), and XLA's
scatter performs a random read-modify-write into HBM per point (~90 ns/update
measured end-to-end — the single largest cost in the detection pipeline at
~5.7 ms/frame). Sorting the points by destination is measured ~free on TPU
(XLA bitonic sort), which unlocks a tiled kernel:

  1. XLA pre-pass sorts (flat_index, value) by flat_index;
  2. grid over output tiles (a tile = a contiguous row-band of the BEV volume,
     sized to sit in VMEM); per-tile point windows are located with a cheap
     searchsorted on the host side of the graph;
  3. each kernel instance DMAs its contiguous point window HBM->VMEM and
     applies the updates as *VMEM* read-modify-writes — each point is visited
     exactly once, and the 48 MB output is written back once, sequentially.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, cfg as _default_cfg

# window of sorted points DMA'd into VMEM per chunk
_MAX_W = 16384


def _kernel(starts_ref, flat_ref, val_ref, out_ref, sflat, sval, sems,
            *, tile_flat: int, n_chunks: int, max_w: int):
    t = pl.program_id(0)
    base = t * tile_flat
    start = starts_ref[t]
    end = starts_ref[t + 1]

    out_ref[:] = jnp.zeros_like(out_ref)

    def chunk_body(c, _):
        chunk_start = start + c * max_w

        @pl.when(chunk_start < end)
        def _():
            cp_f = pltpu.make_async_copy(
                flat_ref.at[pl.ds(chunk_start, max_w)], sflat, sems.at[0])
            cp_v = pltpu.make_async_copy(
                val_ref.at[pl.ds(chunk_start, max_w)], sval, sems.at[1])
            cp_f.start()
            cp_v.start()
            cp_f.wait()
            cp_v.wait()
            count = jnp.minimum(end - chunk_start, max_w)

            def point_body(i, _):
                idx = sflat[i] - base
                v = sval[i]
                cur = out_ref[idx]
                out_ref[idx] = jnp.maximum(cur, v)
                return 0

            jax.lax.fori_loop(0, count, point_body, 0)

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def scatter_max_sorted(flat: jnp.ndarray, val: jnp.ndarray, n_flat: int,
                       tile_flat: int,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Dense max-scatter of (N,) values at (N,) destination indices.

    ``flat`` entries equal to ``n_flat`` are dropped (padding sentinel);
    ``n_flat`` must be a multiple of ``tile_flat``. Values must be >= 0 (the
    output is zero-initialized, matching the voxelizer's semantics).
    """
    assert n_flat % tile_flat == 0
    n = flat.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    sflat, sval = jax.lax.sort((flat.astype(jnp.int32), val), num_keys=1)
    # pad so window DMAs never run off the end
    sflat = jnp.concatenate(
        [sflat, jnp.full((_MAX_W,), n_flat, jnp.int32)])
    sval = jnp.concatenate([sval, jnp.zeros((_MAX_W,), val.dtype)])

    n_tiles = n_flat // tile_flat
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_flat
    starts = jnp.searchsorted(sflat[:n], bounds).astype(jnp.int32)
    n_chunks = -(-n // _MAX_W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile_flat,), lambda i, *_: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_MAX_W,), jnp.int32),
                        pltpu.VMEM((_MAX_W,), val.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_kernel, tile_flat=tile_flat,
                               n_chunks=int(n_chunks), max_w=_MAX_W)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_flat,), val.dtype),
        interpret=interpret,
    )(starts, sflat, sval)


def heights_pallas(points: jnp.ndarray, cfg: Config = _default_cfg,
                   num_points: Optional[jnp.ndarray] = None,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """BEV height channels via the Pallas kernel: (N, 4) -> (Xn, Yn, Zn).

    Semantics identical to the height channels of
    :func:`mv3d_tpu.ops.voxelize.lidar_to_top` (including the inclusive
    slice-boundary redirect).
    """
    from .voxelize import _crop_mask

    t = cfg.top
    xn, yn, zn = t.xn, t.yn, t.zn
    n_cells = xn * yn
    valid = _crop_mask(points, cfg, num_points)

    qx = jnp.floor((points[:, 0] - t.x_min) / t.x_div).astype(jnp.int32)
    qy = jnp.floor((points[:, 1] - t.y_min) / t.y_div).astype(jnp.int32)
    qz = ((points[:, 2] - t.z_min) / t.z_div).astype(jnp.float32)
    cell = jnp.where(valid, (xn - 1 - qx) * yn + (yn - 1 - qy), n_cells)
    s = jnp.minimum(jnp.floor(qz), zn - 1).astype(jnp.int32)
    frac = qz - s.astype(jnp.float32)
    exact = (frac == 0.0) & (s >= 1)
    s_eff = jnp.where(exact, s - 1, s)
    val = jnp.where(valid, jnp.where(exact, 1.0, frac), 0.0)
    flat = jnp.where(valid, cell * zn + s_eff, n_cells * zn)

    # tile = a contiguous band of BEV rows; pick the largest row count whose
    # tile fits comfortably in VMEM and divides xn
    row_flat = yn * zn
    rows_per_tile = 1
    for cand in (16, 8, 5, 4, 2, 1):
        if xn % cand == 0 and cand * row_flat * 4 <= 2 * 1024 * 1024:
            rows_per_tile = cand
            break
    heights = scatter_max_sorted(flat, val, n_cells * zn,
                                 rows_per_tile * row_flat,
                                 interpret=interpret)
    return heights.reshape(xn, yn, zn)
