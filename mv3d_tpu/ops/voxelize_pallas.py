"""Pallas TPU kernel: sorted segment scatter-max for the BEV height channels.

Why: the dense height volume is (cells * slices) = 12M f32 (48 MB), and XLA's
scatter performs a random read-modify-write into HBM per point (~90 ns/update
measured end-to-end — the single largest cost in the detection pipeline at
~5.7 ms/frame). Sorting the points by destination is measured ~free on TPU
(XLA bitonic sort), which unlocks a tiled kernel:

  1. XLA pre-pass sorts (flat_index, value) by flat_index;
  2. grid over contiguous, VMEM-sized tiles of the flat output space; each
     tile's contiguous point window is located with a cheap searchsorted;
  3. each kernel instance DMAs its point window HBM->VMEM and applies the
     updates as masked (8, 128)-block read-modify-writes in *VMEM* (Mosaic
     has no scalar VMEM stores) — each point is visited exactly once and the
     48 MB output is written back once, sequentially.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, cfg as _default_cfg

_MAX_W = 2048         # sorted-point window DMA'd into SMEM per chunk
                      # (scalar dynamic loads are an SMEM operation on TPU)
import os as _os0
_UNROLL = int(_os0.environ.get("MV3D_UNROLL", "8"))
                      # branch-free unroll of the RMW point loop (masked
                      # identity updates for the tail): the Mosaic loop
                      # backedge costs ~tens of ns/iteration — round-3 e2e
                      # sweep: unroll 1/4/8/16 = 168.1/187.2/193.9/192.4 fps
                      # (8 also the tightest run-to-run). Env-overridable.
_TILE = 131072        # flat outputs per tile: (1024, 128) f32 = 512 KB VMEM
_LANES = 128
_SUB = 8              # f32 sublane tile


def _kernel(starts_ref, flat_ref, val_ref, out_ref, sflat, sval, sems,
            *, tile_flat: int, n_chunks: int, max_w: int):
    t = pl.program_id(0)
    base = t * tile_flat
    start = starts_ref[t]
    end = starts_ref[t + 1]

    out_ref[:] = jnp.zeros_like(out_ref)
    lin_ids = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0) * _LANES +
               jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1))

    # DMA source offsets must be tile-aligned: round the window start down
    start_aligned = pl.multiple_of((start // max_w) * max_w, max_w)

    def chunk_body(c, _):
        chunk_start = pl.multiple_of(start_aligned + c * max_w, max_w)
        cp_f = pltpu.make_async_copy(
            flat_ref.at[pl.ds(chunk_start, max_w)], sflat, sems.at[0])
        cp_v = pltpu.make_async_copy(
            val_ref.at[pl.ds(chunk_start, max_w)], sval, sems.at[1])
        cp_f.start()
        cp_v.start()
        cp_f.wait()
        cp_v.wait()
        lo = jnp.maximum(start - chunk_start, 0)
        hi = jnp.minimum(end - chunk_start, max_w)

        def point_body(i, _):
            idx = sflat[i] - base                 # [0, tile_flat)
            v = sval[i]
            blk = idx // (_SUB * _LANES)
            off = idx - blk * (_SUB * _LANES)
            cur = out_ref[blk]                    # (8, 128) VMEM tile
            # single-compare hit mask; max(cur, select) = masked max
            out_ref[blk] = jnp.maximum(
                cur, jnp.where(lin_ids == off, v, 0.0))
            return 0

        jax.lax.fori_loop(lo, hi, point_body, 0)
        return 0

    # dynamic trip count: only chunks overlapping this tile's window run
    # (the static bound wastes ~n_chunks branch iterations per program)
    n_active = jnp.clip((end - start_aligned + max_w - 1) // max_w,
                        0, n_chunks)
    jax.lax.fori_loop(0, n_active, chunk_body, 0)


def scatter_max_sorted(flat: jnp.ndarray, val: jnp.ndarray, n_flat: int,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Dense max-scatter of (N,) non-negative values at (N,) indices.

    Entries with ``flat >= n_flat`` are dropped (padding sentinel). Returns a
    zero-initialized (n_flat,) f32 buffer with per-index maxima.
    """
    n = flat.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n_pad = -(-n_flat // _TILE) * _TILE
    n_tiles = n_pad // _TILE

    # route all sentinels beyond the padded space
    flat = jnp.where(flat >= n_flat, n_pad, flat.astype(jnp.int32))
    sflat, sval = jax.lax.sort((flat, val.astype(jnp.float32)), num_keys=1)
    # pad so window DMAs never run off the end
    sflat = jnp.concatenate([sflat, jnp.full((_MAX_W,), n_pad, jnp.int32)])
    sval = jnp.concatenate([sval, jnp.zeros((_MAX_W,), jnp.float32)])

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * _TILE
    starts = jnp.searchsorted(sflat[:n], bounds).astype(jnp.int32)
    n_chunks = -(-n // _MAX_W) + 1    # +1: window starts align down

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_TILE // (_SUB * _LANES), _SUB, _LANES),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((_MAX_W,), jnp.int32),
                        pltpu.SMEM((_MAX_W,), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_kernel, tile_flat=_TILE,
                               n_chunks=int(n_chunks), max_w=_MAX_W)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad // (_SUB * _LANES), _SUB, _LANES), jnp.float32),
        interpret=interpret,
    )(starts, sflat, sval)
    return out.reshape(-1)[:n_flat]


# ---------------------------------------------------------------------------
# tile binning without a sort
# ---------------------------------------------------------------------------

def bin_points_by_tile(flat: jnp.ndarray, payloads, tile_span: int,
                       n_tiles: int, sentinel: int):
    """Stable counting-permutation of points into tile buckets.

    MEASURED RESULT (round 2, v5e, e2e): SLOWER than ``jax.lax.sort`` — this
    permutation's *placement* step (one 65k-element permutation scatter +
    gathers, or three scatters) hits the same per-element serialization that
    makes TPU scatters slow in the first place (sort-mode e2e 101.6 fps vs
    90.0/80.6 fps for the two placement variants). The device trace later
    showed the batched lax.sort is in fact nearly free (~0.08 ms/frame,
    docs/PALLAS_NOTES.md), so there is nothing left to beat. Kept as a
    correct, tested alternative (pipeline.voxel_order="bin") and as
    documentation of the dead end.

    Why grouping is sufficient (no full sort needed): the sweep kernel only
    needs points GROUPED by output tile, and within a bucket the scan's
    strict-``>`` maximum is order-independent while ties resolve to the first
    point in *encounter* order — which this permutation keeps equal to the
    original point order, preserving the reference's first-max-point
    intensity semantics (src/data.py:355-356).

    Mechanics (all vectorized, MXU for the rank matmul):
      1. bucket = flat // tile_span (entries with flat >= n_tiles*tile_span,
         i.e. the padding sentinel, go to a trailing dump bucket);
      2. per-128-point-chunk histograms + exclusive scan -> chunk offsets;
      3. rank within chunk via a strict-lower-triangular one-hot matmul;
      4. position = bucket offset + chunk prefix + in-chunk rank — a
         permutation, placed with three unique-index scatters.

    Returns (binned arrays [flat first, then payloads], starts (n_tiles+1,)).
    """
    n = flat.shape[0]
    chunk = 128
    assert n % chunk == 0, n
    nb = n_tiles + 1
    nb_pad = -(-nb // 128) * 128

    bucket = jnp.minimum(flat // tile_span, n_tiles)
    onehot = (bucket[:, None] == jnp.arange(nb_pad, dtype=jnp.int32)[None, :])
    oh = onehot.reshape(n // chunk, chunk, nb_pad).astype(jnp.float32)
    chunk_hist = jnp.sum(oh, axis=1)                            # (C, nb_pad)
    chunk_prefix = jnp.cumsum(chunk_hist, axis=0) - chunk_hist  # exclusive
    counts = jnp.sum(chunk_hist, axis=0)                        # (nb_pad,)
    offsets = jnp.cumsum(counts) - counts                       # exclusive

    tril = jnp.tril(jnp.ones((chunk, chunk), jnp.float32), k=-1)
    rank_in_chunk = jax.lax.dot_general(
        tril, oh, ((( 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (chunk, C, nb_pad)
    rank_in_chunk = jnp.transpose(rank_in_chunk, (1, 0, 2))
    rank = rank_in_chunk + chunk_prefix[:, None, :]
    pos_in_bucket = jnp.sum(rank * oh, axis=-1).reshape(n)      # one-hot select
    position = (offsets[bucket] + pos_in_bucket).astype(jnp.int32)

    # callers route invalid points to flat == sentinel (>= n_tiles*tile_span)
    # beforehand, so the dump bucket's contents already carry the sentinel.
    # ONE permutation scatter (the source index), then vectorized gathers for
    # the data arrays — TPU scatters serialize per element, gathers don't.
    del sentinel
    sidx = jnp.zeros(n, jnp.int32).at[position].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    binned = [arr[sidx] for arr in (flat, *payloads)]
    starts = offsets[:n_tiles + 1].astype(jnp.int32)
    return binned, starts


# ---------------------------------------------------------------------------
# fused kernel: heights + intensity + density in ONE sorted sweep
# ---------------------------------------------------------------------------

_CT = 4096            # cells per tile; CT*zn and CT are multiples of 1024


def _fused_kernel_grouped(starts_ref, flat_ref, hval_ref, refl_ref,
                          hout_ref, cout_ref, rout_ref,
                          sflat, shval, srefl, zbest, sems,
                          *, ct: int, zn: int, n_chunks: int, max_w: int,
                          n_stride: int, lane_pad: bool = False,
                          hacc=None):
    """Per-point VMEM-RMW sweep body (the round-2 kernel) — order-independent
    within a tile, so it is the only valid body for the ``voxel_order="bin"``
    grouping (which only buckets points by tile, keeping encounter order),
    and selectable for sorted orders via ``pipeline.sweep_kernel="rmw"``.
    The register-cached :func:`_fused_kernel` trades the ~5 VMEM ops per
    point here for loop-carried vregs plus two branches per point.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    base_flat = t * ct * (_LANES if lane_pad else zn)
    start = starts_ref[b, t]
    end = starts_ref[b, t + 1]
    frame_base = pl.multiple_of(b * n_stride, max_w)

    # bf16 output: accumulate heights in an f32 VMEM scratch and convert
    # once per tile at the end — per-point bf16 RMWs are impossible (the
    # round-2 in-kernel bf16 store died on the (8,128) i1 mask -> (16,128)
    # bf16 relayout), while max-then-round-once is EXACTLY the documented
    # bf16 view semantics (monotone rounding commutes with max; the XLA
    # convert pass this replaces traced at 137 us/frame)
    hdst = hout_ref if hacc is None else hacc
    hdst[:] = jnp.zeros_like(hdst)
    cout_ref[:] = jnp.zeros_like(cout_ref)
    rout_ref[:] = jnp.zeros_like(rout_ref)
    zbest[:] = jnp.full_like(zbest, -1.0)
    lin_ids = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0) * _LANES +
               jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1))

    start_aligned = pl.multiple_of((start // max_w) * max_w, max_w)

    def chunk_body(c, _):
        chunk_start = pl.multiple_of(start_aligned + c * max_w, max_w)
        src_off = pl.multiple_of(frame_base + chunk_start, max_w)
        cps = [pltpu.make_async_copy(
            r.at[pl.ds(src_off, max_w)], s, sems.at[i])
            for i, (r, s) in enumerate(
                [(flat_ref, sflat), (hval_ref, shval), (refl_ref, srefl)])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        lo = jnp.maximum(start - chunk_start, 0)
        hi = jnp.minimum(end - chunk_start, max_w)

        def one_point(i, valid):
            """RMW updates for point i; ``valid`` masks tail points to
            IDENTITY updates (max with 0 / add 0 / no winner change), so the
            unrolled loop needs no per-point branch."""
            ir = jnp.minimum(i, max_w - 1)
            # invalid slots read some other tile's point: route them to
            # flat 0 so every derived STORE index stays in range (their
            # update values are already masked to identities)
            f = jnp.where(valid, sflat[ir] - base_flat, 0)   # [0, ct*zn)
            v = jnp.where(valid, shval[ir], 0.0)
            blk = f // (_SUB * _LANES)
            off = f - blk * (_SUB * _LANES)
            hupd = jnp.where(valid & (lin_ids == off), v, 0.0)
            if hacc is None:
                hout_ref[0, blk] = jnp.maximum(hout_ref[0, blk], hupd)
            else:
                hacc[blk] = jnp.maximum(hacc[blk], hupd)

            if lane_pad:
                sc = f // _LANES                  # local supercell
                lane = f - sc * _LANES
                sub = lane // zn                  # folded (dy, dx)
                lc = sc * 4 + sub                 # local cell [0, 4*ct)
                s_eff = lane - sub * zn
            else:
                lc = f // zn                      # local cell [0, ct)
                s_eff = f - lc * zn
            qz = s_eff.astype(jnp.float32) + v
            cblk = lc // (_SUB * _LANES)
            coff = lc - cblk * (_SUB * _LANES)
            hit = valid & (lin_ids == coff)
            cout_ref[0, cblk] = cout_ref[0, cblk] + jnp.where(hit, 1.0, 0.0)
            zb = zbest[cblk]
            upd = hit & (qz > zb)
            zbest[cblk] = jnp.where(upd, qz, zb)
            rout_ref[0, cblk] = jnp.where(upd, srefl[ir], rout_ref[0, cblk])

        # branch-free 4x unroll: Mosaic's per-iteration loop overhead (the
        # backedge branch + bounds check, ~tens of ns — the same cost that
        # sank the branching "chains"/"regcache" bodies) is paid once per 4
        # points; invalid tail slots execute masked identity updates.
        def body4(j, _):
            base_i = lo + j * _UNROLL
            for k in range(_UNROLL):
                one_point(base_i + k, base_i + k < hi)
            return 0

        jax.lax.fori_loop(0, (hi - lo + _UNROLL - 1) // _UNROLL, body4, 0)
        return 0

    # dynamic trip count: most tiles hold well under one DMA window of
    # points, while the static bound n_chunks covers the whole frame — a
    # fori to the static bound costs ~n_chunks wasted branch iterations in
    # EVERY grid program (~1 ms/frame at (B, n_tiles) = (16, 119), measured
    # round 3, docs/PALLAS_NOTES.md)
    n_active = jnp.clip((end - start_aligned + max_w - 1) // max_w,
                        0, n_chunks)
    jax.lax.fori_loop(0, n_active, chunk_body, 0)
    if hacc is not None:
        hout_ref[0] = hacc[:].astype(hout_ref.dtype)


def _fused_kernel_chains(starts_ref, flat_ref, hval_ref, refl_ref,
                         hout_ref, cout_ref, rout_ref,
                         sflat, shval, srefl, zsc, isc, sems,
                         *, ct: int, zn: int, n_chunks: int, max_w: int,
                         n_stride: int, lane_pad: bool = False,
                         k_chains: int = 4):
    """Multi-chain sweep: each DMA chunk's point window is split into
    ``k_chains`` CONTIGUOUS segments processed in lockstep, one register
    accumulator set per chain.

    Why: the single-chain bodies are serialized per point — the RMW body by
    unprovable load-after-store hazards on the output blocks (consecutive
    points may hit the same (8, 128) block), the regcache body by its
    loop-carried vector dependency chain. K independent contiguous segments
    give the scheduler K interleavable dependency chains (~K-way ILP on
    both the scalar address math and the vector selects) while keeping each
    chain's stream sorted, so the within-chain tie rule stays "first point
    wins" and flushes stay rare (one per block per chain).

    Cross-chain/cross-chunk correctness comes from MERGE flushes instead of
    overwrites: heights merge with max, counts with add, and the intensity
    winner with a (best-z, global point index) lexicographic compare held
    in the ``zsc``/``isc`` scratch — so two chains (or two chunks) that
    split one block's points combine associatively, in any flush order.
    The global sort position breaks z-ties exactly like the reference's
    first-point-wins scan (indices < 2^24 are exact in f32).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    base_flat = t * ct * (_LANES if lane_pad else zn)
    start = starts_ref[b, t]
    end = starts_ref[b, t + 1]
    frame_base = pl.multiple_of(b * n_stride, max_w)

    hout_ref[:] = jnp.zeros_like(hout_ref)
    cout_ref[:] = jnp.zeros_like(cout_ref)
    rout_ref[:] = jnp.zeros_like(rout_ref)
    zsc[:] = jnp.full_like(zsc, -1.0)
    isc[:] = jnp.full_like(isc, 3.0e7)          # > any point index
    lin_ids = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0) * _LANES +
               jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1))
    vzero = jnp.zeros((_SUB, _LANES), jnp.float32)

    start_aligned = pl.multiple_of((start // max_w) * max_w, max_w)

    def flush_h(hblk, hacc):
        hout_ref[0, hblk] = jnp.maximum(hout_ref[0, hblk], hacc)

    def flush_c(cblk, cacc, zacc, iacc, racc):
        cout_ref[0, cblk] = cout_ref[0, cblk] + cacc
        zcur = zsc[cblk]
        icur = isc[cblk]
        better = (zacc > zcur) | ((zacc == zcur) & (iacc < icur))
        zsc[cblk] = jnp.where(better, zacc, zcur)
        isc[cblk] = jnp.where(better, iacc, icur)
        rout_ref[0, cblk] = jnp.where(better, racc, rout_ref[0, cblk])

    def chunk_body(c, _):
        chunk_start = pl.multiple_of(start_aligned + c * max_w, max_w)
        src_off = pl.multiple_of(frame_base + chunk_start, max_w)
        cps = [pltpu.make_async_copy(
            r.at[pl.ds(src_off, max_w)], s, sems.at[i])
            for i, (r, s) in enumerate(
                [(flat_ref, sflat), (hval_ref, shval), (refl_ref, srefl)])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        lo = jnp.maximum(start - chunk_start, 0)
        hi = jnp.minimum(end - chunk_start, max_w)
        seg = (hi - lo + k_chains - 1) // k_chains
        los = [lo + k * seg for k in range(k_chains)]
        lims = [jnp.minimum(lo + (k + 1) * seg, hi) for k in range(k_chains)]

        def point_body(j, carry):
            new = []
            for k in range(k_chains):
                hblk, hacc, cblk, cacc, zacc, iacc, racc = carry[k]
                i = los[k] + j
                valid = i < lims[k]
                ir = jnp.minimum(i, max_w - 1)
                f = sflat[ir] - base_flat
                v = jnp.where(valid, shval[ir], 0.0)
                blk = f // (_SUB * _LANES)
                off = f - blk * (_SUB * _LANES)
                sw = valid & (blk != hblk)

                @pl.when(sw)
                def _(hblk=hblk, hacc=hacc):
                    flush_h(hblk, hacc)

                hacc = jnp.where(sw, vzero, hacc)
                hblk = jnp.where(sw, blk, hblk)
                hacc = jnp.maximum(hacc, jnp.where(
                    valid & (lin_ids == off), v, 0.0))

                if lane_pad:
                    sc = f // _LANES
                    lane = f - sc * _LANES
                    sub = lane // zn
                    lc = sc * 4 + sub
                    s_eff = lane - sub * zn
                else:
                    lc = f // zn
                    s_eff = f - lc * zn
                qz = s_eff.astype(jnp.float32) + v
                nblk = lc // (_SUB * _LANES)
                coff = lc - nblk * (_SUB * _LANES)
                sw_c = valid & (nblk != cblk)

                @pl.when(sw_c)
                def _(cblk=cblk, cacc=cacc, zacc=zacc, iacc=iacc, racc=racc):
                    flush_c(cblk, cacc, zacc, iacc, racc)

                cacc = jnp.where(sw_c, vzero, cacc)
                zacc = jnp.where(sw_c, vzero - 1.0, zacc)
                iacc = jnp.where(sw_c, vzero + 3.0e7, iacc)
                racc = jnp.where(sw_c, vzero, racc)
                cblk = jnp.where(sw_c, nblk, cblk)

                hit = valid & (lin_ids == coff)
                cacc = cacc + jnp.where(hit, 1.0, 0.0)
                # within a chain the stream is sorted, so strict > keeps
                # the first (lowest-index) point on qz ties
                upd = hit & (qz > zacc)
                idxv = (chunk_start + i).astype(jnp.float32)
                zacc = jnp.where(upd, qz, zacc)
                iacc = jnp.where(upd, idxv, iacc)
                racc = jnp.where(upd, srefl[ir], racc)
                new.append((hblk, hacc, cblk, cacc, zacc, iacc, racc))
            return tuple(new)

        init = tuple(
            (jnp.int32(0), vzero, jnp.int32(0), vzero, vzero - 1.0,
             vzero + 3.0e7, vzero) for _ in range(k_chains))
        carry = jax.lax.fori_loop(0, seg, point_body, init)
        # tail: merge every chain's open blocks (no cross-chunk carry)
        for k in range(k_chains):
            hblk, hacc, cblk, cacc, zacc, iacc, racc = carry[k]
            flush_h(hblk, hacc)
            flush_c(cblk, cacc, zacc, iacc, racc)
        return 0

    n_active = jnp.clip((end - start_aligned + max_w - 1) // max_w,
                        0, n_chunks)
    jax.lax.fori_loop(0, n_active, chunk_body, 0)


def _fused_kernel(starts_ref, flat_ref, hval_ref, refl_ref,
                  hout_ref, cout_ref, rout_ref,
                  sflat, shval, srefl, sems,
                  *, ct: int, zn: int, n_chunks: int, max_w: int,
                  n_stride: int, lane_pad: bool = False):
    """Per (frame, cell-tile): replay the sorted point window with
    register-resident accumulators.

    ``lane_pad``: the flat heights space is LANE-PADDED — 128 slots per
    2x2-folded supercell, flat = sc*128 + sub*zn + s_eff with sub = the
    folded (dy, dx) sub-cell in [0, 4) — so the kernel's flat-block output
    reshapes bitcast-free into a (h2, w2p, 128) conv-stem input (the
    round-2 layout's 100-lane minor dim forced a ~0.84 ms/frame XLA
    relayout, docs/PALLAS_NOTES.md). ``ct`` then counts SUPERCELLS per tile
    and the cell space for count/intensity is sc*4 + sub. The height
    accumulation itself is identical — only the f -> (cell, s_eff) map
    changes.

    For each point (one visit): slice-height max into ``hout``, +1 into the
    cell's count in ``cout``, and a running "highest point wins, first one on
    ties" scan for the intensity channel (``rout``). The true z-quantile is
    reconstructed in-kernel as qz = s_eff + hval (f32-exact, including the
    inclusive-boundary redirect where hval == 1.0), so the sort needs no
    extra payload for it.

    Register caching (round 3): an (8, 128) f32 array is exactly ONE vector
    register on TPU, so the current heights block and the current cell block
    (count / best-z / intensity) live in loop-carried vregs instead of VMEM.
    Because the points are sorted by flat index, block ids are monotonically
    non-decreasing — each block is entered and left once, so the registers
    flush to VMEM only on block *transitions* (and once at the end). The
    round-2 kernel instead did ~2 VMEM loads + ~3 VMEM stores per point
    (2.46 ms/frame ≈ 37 ns/point, docs/PALLAS_NOTES.md); steady state is now
    ~10 register ops per point.

    The grid is (B, n_tiles) — the batch is a NATIVE grid dimension because
    ``vmap`` of a scalar-prefetch pallas_call falls back to a sequential
    ``while`` loop with per-frame dynamic-update-slice assembly of the
    outputs (~1 ms/frame measured, docs/PALLAS_NOTES.md round-2 trace).
    The sorted point arrays arrive FLATTENED 1-D with per-frame stride
    ``n_stride`` (a multiple of the DMA window, keeping every window offset
    aligned — Mosaic rejects single-row slices of (8,128)-tiled 2-D VMEM).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    base_flat = t * ct * (_LANES if lane_pad else zn)
    start = starts_ref[b, t]
    end = starts_ref[b, t + 1]
    frame_base = pl.multiple_of(b * n_stride, max_w)

    hout_ref[:] = jnp.zeros_like(hout_ref)
    cout_ref[:] = jnp.zeros_like(cout_ref)
    rout_ref[:] = jnp.zeros_like(rout_ref)
    lin_ids = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0) * _LANES +
               jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1))
    vzero = jnp.zeros((_SUB, _LANES), jnp.float32)

    start_aligned = pl.multiple_of((start // max_w) * max_w, max_w)

    # loop carry: (heights blk id, heights acc, cell blk id, count acc,
    # best-qz acc, intensity acc). Initial block id 0 with zero/neutral
    # accumulators: a first-transition flush then writes the zero-init value
    # back into block 0, which is a no-op.
    init = (jnp.int32(0), vzero, jnp.int32(0), vzero, vzero - 1.0, vzero)

    def chunk_body(c, carry):
        chunk_start = pl.multiple_of(start_aligned + c * max_w, max_w)
        src_off = pl.multiple_of(frame_base + chunk_start, max_w)
        cps = [pltpu.make_async_copy(
            r.at[pl.ds(src_off, max_w)], s, sems.at[i])
            for i, (r, s) in enumerate(
                [(flat_ref, sflat), (hval_ref, shval), (refl_ref, srefl)])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        lo = jnp.maximum(start - chunk_start, 0)
        hi = jnp.minimum(end - chunk_start, max_w)

        def point_body(i, pc):
            hblk, hacc, cblk, cacc, zacc, racc = pc
            f = sflat[i] - base_flat              # [0, ct*zn)
            v = shval[i]
            blk = f // (_SUB * _LANES)
            off = f - blk * (_SUB * _LANES)

            # flush-on-transition as a side-effect-only branch (pl.when) with
            # branch-free where-resets of the carried registers: Mosaic keeps
            # the carries in vregs, while lax.cond with vector RESULTS was
            # measured pathologically slower (round-3 bench)
            sw_h = blk != hblk

            @pl.when(sw_h)
            def _():
                hout_ref[0, hblk] = hacc

            hacc = jnp.where(sw_h, vzero, hacc)
            hacc = jnp.maximum(hacc, jnp.where(lin_ids == off, v, 0.0))

            if lane_pad:
                sc = f // _LANES                  # local supercell
                lane = f - sc * _LANES
                sub = lane // zn                  # folded (dy, dx) in [0, 4)
                lc = sc * 4 + sub                 # local cell [0, 4*ct)
                s_eff = lane - sub * zn
            else:
                lc = f // zn                      # local cell [0, ct)
                s_eff = f - lc * zn
            qz = s_eff.astype(jnp.float32) + v    # exact (see docstring)
            nblk = lc // (_SUB * _LANES)
            coff = lc - nblk * (_SUB * _LANES)

            sw_c = nblk != cblk

            @pl.when(sw_c)
            def _():
                cout_ref[0, cblk] = cacc
                rout_ref[0, cblk] = racc

            cacc = jnp.where(sw_c, vzero, cacc)
            zacc = jnp.where(sw_c, vzero - 1.0, zacc)
            racc = jnp.where(sw_c, vzero, racc)
            hit = lin_ids == coff
            cacc = cacc + jnp.where(hit, 1.0, 0.0)
            upd = hit & (qz > zacc)
            zacc = jnp.where(upd, qz, zacc)
            racc = jnp.where(upd, srefl[i], racc)
            return (blk, hacc, nblk, cacc, zacc, racc)

        return jax.lax.fori_loop(lo, hi, point_body, carry)

    # dynamic trip count (see _fused_kernel_grouped): only chunks that
    # overlap this tile's point window run
    n_active = jnp.clip((end - start_aligned + max_w - 1) // max_w,
                        0, n_chunks)
    hblk, hacc, cblk, cacc, _, racc = jax.lax.fori_loop(
        0, n_active, chunk_body, init)
    # final flush (no-op writes of the zero init if the tile had no points)
    hout_ref[0, hblk] = hacc
    cout_ref[0, cblk] = cacc
    rout_ref[0, cblk] = racc


def scatter_top_fused_batched(flat: jnp.ndarray, hval: jnp.ndarray,
                              refl: jnp.ndarray, n_cells: int, zn: int,
                              interpret: Optional[bool] = None,
                              order: str = "sort",
                              heights_dtype=jnp.float32,
                              body: str = "rmw"
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """Batched sorted sweep: (B, n) inputs -> (heights (B, n_cells*zn),
    count (B, n_cells), intensity (B, n_cells)).

    ``flat`` = cell*zn + s_eff with the boundary redirect already applied;
    entries with ``flat >= n_cells*zn`` are padding. Replaces the three
    separate XLA scatters of ops/voxelize.py (density scatter-add, winner-
    index scatter-min, intensity scatter-max) and the zmax reconstruction —
    reference semantics per src/data.py:340-366 / front_top_kernel.cu:4-65.

    The batch is a native grid dimension (see _fused_kernel); the sort and
    searchsorted batch trivially (lax.sort is per-row on the last axis).

    ``heights_dtype``: f32 (default, oracle-exact) or bf16 — heights are
    then converted in the kernel's PADDED tiled layout, one plain
    elementwise pass, instead of downstream where the unpad slice + reshape
    makes XLA emit a sequential per-frame convert-assembly loop
    (~0.85 ms/frame measured, docs/PALLAS_NOTES.md). The bf16 result is
    exactly the f32 result rounded once. (An in-kernel bf16 store was
    tried first: Mosaic cannot relayout the (8,128) i1 select mask to
    bf16's (16,128) tiling.)
    """
    bsz, n = flat.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n_flat = n_cells * zn
    n_cells_pad = -(-n_cells // _CT) * _CT
    n_tiles = n_cells_pad // _CT
    n_flat_pad = n_cells_pad * zn
    blk = _SUB * _LANES
    h_blocks = (_CT * zn) // blk          # blocks per heights tile
    c_blocks = _CT // blk                 # blocks per cell tile

    flat = jnp.where(flat >= n_flat, n_flat_pad, flat.astype(jnp.int32))
    if order == "bin":
        # grouping by tile is enough for the sweep (see bin_points_by_tile);
        # measured slower than sorting on v5e — kept as a tested alternative
        def group(f, h, r):
            (sf, sh, sr), st = bin_points_by_tile(
                f, (h.astype(jnp.float32), r.astype(jnp.float32)),
                _CT * zn, n_tiles, n_flat_pad)
            return sf, sh, sr, st
        sflat, shval, srefl, starts = jax.vmap(group)(flat, hval, refl)
    elif order in ("pallas-sort", "bitonic") and (n & (n - 1)) == 0:
        def sort_one(f, h, r):
            if order == "pallas-sort":
                from .sort_pallas import bitonic_sort_pallas
                return bitonic_sort_pallas(
                    f, (h.astype(jnp.float32), r.astype(jnp.float32)),
                    interpret=interpret)
            from .sort import bitonic_sort_stable
            return bitonic_sort_stable(
                f, (h.astype(jnp.float32), r.astype(jnp.float32)))
        sflat, shval, srefl = jax.vmap(sort_one)(flat, hval, refl)
        starts = None
    else:
        sflat, shval, srefl = jax.lax.sort(
            (flat, hval.astype(jnp.float32), refl.astype(jnp.float32)),
            num_keys=1)
        starts = None
    if starts is None:
        bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (_CT * zn)
        starts = jax.vmap(
            lambda row: jnp.searchsorted(row, bounds))(sflat[:, :n])
        starts = starts.astype(jnp.int32)

    # flatten to 1-D with a window-aligned per-frame stride (see kernel doc)
    pad_cols = _MAX_W + (-n % _MAX_W)
    n_stride = n + pad_cols
    assert n_stride % _MAX_W == 0
    pad = ((0, 0), (0, pad_cols))
    sflat = jnp.pad(sflat, pad, constant_values=n_flat_pad).reshape(-1)
    shval = jnp.pad(shval, pad).reshape(-1)
    srefl = jnp.pad(srefl, pad).reshape(-1)
    n_chunks = -(-n // _MAX_W) + 1

    # "bin" only groups by tile (encounter order within a tile) -> the
    # register-cached/chains kernels' monotone-block invariant doesn't
    # hold; it must use the order-independent RMW body.
    if order == "bin":
        body = "rmw"
    extra = {"rmw": [pltpu.VMEM((c_blocks, _SUB, _LANES), jnp.float32)],
             "regcache": [],
             "chains": [pltpu.VMEM((c_blocks, _SUB, _LANES), jnp.float32)] * 2,
             }[body]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[
            pl.BlockSpec((1, h_blocks, _SUB, _LANES),
                         lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_blocks, _SUB, _LANES),
                         lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_blocks, _SUB, _LANES),
                         lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((_MAX_W,), jnp.int32),
                        pltpu.SMEM((_MAX_W,), jnp.float32),
                        pltpu.SMEM((_MAX_W,), jnp.float32)]
        + extra
        + [pltpu.SemaphoreType.DMA((3,))],
    )
    kernel_body = {"rmw": _fused_kernel_grouped, "regcache": _fused_kernel,
                   "chains": _fused_kernel_chains}[body]
    kernel = functools.partial(kernel_body, ct=_CT, zn=int(zn),
                               n_chunks=int(n_chunks), max_w=_MAX_W,
                               n_stride=int(n_stride))
    heights, count, inten = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_tiles * h_blocks, _SUB, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_tiles * c_blocks, _SUB, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_tiles * c_blocks, _SUB, _LANES),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(starts, sflat, shval, srefl)
    if heights_dtype != jnp.float32:
        heights = heights.astype(heights_dtype)   # padded layout: one pass
    return (heights.reshape(bsz, -1)[:, :n_flat],
            count.reshape(bsz, -1)[:, :n_cells],
            inten.reshape(bsz, -1)[:, :n_cells])


import os as _os

_SC_T = int(_os.environ.get("MV3D_SC_T", "0"))
                      # supercells per lane-padded tile (0 = auto). Big tiles
                      # win (fewer grid programs beat the bigger zero-init:
                      # measured r3 e2e 166.6 fps @1024 -> 168.1 @4096).
                      # Env-overridable for tile-size experiments.
_SC_T_CAP = 8192      # auto-selection cap: heights block <= 4 MB f32 VMEM


def _pick_sc_tile(n_sc: int) -> int:
    """Supercells per tile: largest multiple of 256 (so the count/intensity
    planes tile into whole (8, 128) blocks) under the cap that divides
    ``n_sc`` EXACTLY — then the kernel's padded output IS the valid output
    and the caller's crop slice is a no-op (the 4096-with-padding scheme
    cost a traced 140 us/frame full copy of the (B, n_sc/8, 8, 128) bf16
    heights just to drop the 1% tile padding; KITTI s2d2p n_sc = 400*304 =
    121600 = 25 * 4864). Falls back to padded 4096 tiles when no such
    divisor exists."""
    if _SC_T:
        return _SC_T
    for k in range(_SC_T_CAP - _SC_T_CAP % 256, 0, -256):
        if n_sc % k == 0:
            return k
    return 4096


def scatter_top_padded_batched(flat: jnp.ndarray, hval: jnp.ndarray,
                               refl: jnp.ndarray, n_sc: int, zn: int,
                               interpret: Optional[bool] = None,
                               body: str = "rmw",
                               heights_dtype=jnp.float32
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Lane-padded batched sorted sweep (``view_layout="s2d2p"``).

    ``flat`` = sc*128 + sub*zn + s_eff over 2x2-folded supercells sc in
    [0, n_sc) row-major over the (h2, w2p) folded grid, sub = (dy*2+dx);
    entries >= n_sc*128 are padding. Returns

      * heights BLOCKS (B, n_sc/8, 8, 128) f32 — physically identical to the
        (B, h2, w2p, 128) conv-stem input when w2p %% 8 == 0 (each (8, 128)
        block is 8 consecutive supercells of one row), so the caller's
        reshape is layout-preserving — the whole point of this layout;
      * count (B, n_sc*4) and intensity (B, n_sc*4) per folded cell
        (cell = sc*4 + sub), for the 8-channel aux plane of the split stem.

    Only the sorted order is supported (the register-cached kernel needs
    monotone block ids). Requires 4*zn <= 128 and n_sc %% 8 == 0.
    """
    bsz, n = flat.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert 4 * zn <= _LANES, (zn,)
    assert n_sc % _SUB == 0, (n_sc,)
    heights_bf16 = jnp.dtype(heights_dtype) != jnp.float32
    assert not (heights_bf16 and body != "rmw"), \
        "in-kernel bf16 heights: rmw body only"

    n_flat = n_sc * _LANES
    sc_t = _pick_sc_tile(n_sc)
    n_sc_pad = -(-n_sc // sc_t) * sc_t
    n_tiles = n_sc_pad // sc_t
    n_flat_pad = n_sc_pad * _LANES
    blk = _SUB * _LANES
    h_blocks = (sc_t * _LANES) // blk
    c_blocks = (sc_t * 4) // blk

    flat = jnp.where(flat >= n_flat, n_flat_pad, flat.astype(jnp.int32))
    sflat, shval, srefl = jax.lax.sort(
        (flat, hval.astype(jnp.float32), refl.astype(jnp.float32)),
        num_keys=1)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (sc_t * _LANES)
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds))(sflat[:, :n])
    starts = starts.astype(jnp.int32)

    pad_cols = _MAX_W + (-n % _MAX_W)
    n_stride = n + pad_cols
    pad = ((0, 0), (0, pad_cols))
    sflat = jnp.pad(sflat, pad, constant_values=n_flat_pad).reshape(-1)
    shval = jnp.pad(shval, pad).reshape(-1)
    srefl = jnp.pad(srefl, pad).reshape(-1)
    n_chunks = -(-n // _MAX_W) + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[
            pl.BlockSpec((1, h_blocks, _SUB, _LANES),
                         lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_blocks, _SUB, _LANES),
                         lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_blocks, _SUB, _LANES),
                         lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SMEM((_MAX_W,), jnp.int32),
                        pltpu.SMEM((_MAX_W,), jnp.float32),
                        pltpu.SMEM((_MAX_W,), jnp.float32)]
        + {"rmw": [pltpu.VMEM((c_blocks, _SUB, _LANES), jnp.float32)],
           "regcache": [],
           "chains": [pltpu.VMEM((c_blocks, _SUB, _LANES),
                                 jnp.float32)] * 2}[body]
        + ([pltpu.VMEM((h_blocks, _SUB, _LANES), jnp.float32)]
           if heights_bf16 else [])
        + [pltpu.SemaphoreType.DMA((3,))],
    )
    kernel_body = {"rmw": _fused_kernel_grouped, "regcache": _fused_kernel,
                   "chains": _fused_kernel_chains}[body]
    kernel = functools.partial(kernel_body, ct=sc_t, zn=int(zn),
                               n_chunks=int(n_chunks), max_w=_MAX_W,
                               n_stride=int(n_stride), lane_pad=True)
    if heights_bf16:
        base_kernel = kernel

        def kernel(starts_ref, f_ref, h_ref, r_ref, ho, co, ro,
                   sf, sh, sr, zb, ha, sem):
            base_kernel(starts_ref, f_ref, h_ref, r_ref, ho, co, ro,
                        sf, sh, sr, zb, sem, hacc=ha)

    heights, count, inten = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_tiles * h_blocks, _SUB, _LANES),
                                 jnp.dtype(heights_dtype)),
            jax.ShapeDtypeStruct((bsz, n_tiles * c_blocks, _SUB, _LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_tiles * c_blocks, _SUB, _LANES),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(starts, sflat, shval, srefl)
    heights = heights[:, :n_sc // _SUB]           # tile-aligned block slice
    return (heights,
            count.reshape(bsz, -1)[:, :n_sc * 4],
            inten.reshape(bsz, -1)[:, :n_sc * 4])


def scatter_top_fused(flat: jnp.ndarray, hval: jnp.ndarray,
                      refl: jnp.ndarray, n_cells: int, zn: int,
                      interpret: Optional[bool] = None,
                      order: str = "sort", body: str = "rmw"
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-frame wrapper over :func:`scatter_top_fused_batched` (B=1)."""
    heights, count, inten = scatter_top_fused_batched(
        flat[None], hval[None], refl[None], n_cells, zn,
        interpret=interpret, order=order, body=body)
    return heights[0], count[0], inten[0]


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

    heights = scatter_max_sorted(flat, val, n_cells * zn, interpret=interpret)
    return heights.reshape(xn, yn, zn)
