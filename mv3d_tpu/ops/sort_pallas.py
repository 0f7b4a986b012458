"""Pallas TPU kernel: VMEM-resident stable bitonic sort.

Why a kernel: ``jax.lax.sort`` costs 3.6 ms/frame for the voxelizer's 65k
(i32, f32, f32) operands — the largest single stage in the detection
pipeline — and the pure-jnp bitonic network (ops/sort.py) is slower still
(its j < 128 exchange stages reshape at sub-lane granularity, which XLA
lowers to strided relayout copies). Here the whole problem (4 x 256 KB)
lives in VMEM and the lane-granularity problem is solved by DOMAIN
SWITCHING:

  * N-domain: data as (rows, 128), element i at (i >> 7, i & 127). A stage
    with pair distance j >= 128 flips a ROW bit -> the exchange is a
    sublane-axis regroup ``(rows/(2d), 2, d, 128)`` + two selects. Free of
    lane crossings.
  * T-domain: the full transpose (128, rows), element i at (i & 127, i >> 7).
    A stage with j < 128 flips a LANE bit of i — which is now a ROW bit ->
    the same cheap regroup applies. The VPU's transpose unit pays for the
    domain switch once per k-level instead of per stage.

Per k-level the j sweep is monotonically shrinking, so all j >= 128 stages
run first (N), then one switch, then the j <= 64 tail (T). 2 transposes per
level, 136 elementwise stages total for n = 65536.

Stability: bitonic networks are not stable, so the original index rides
along as an explicit secondary comparator key (4 arrays total: key, idx,
and the two payloads); the result equals ``lax.sort`` with ``num_keys=2``
over (key, iota) exactly — verified bit-for-bit in tests and against the
fused voxelizer oracle.

MEASURED RESULT (round 2, v5e): bit-correct on TPU, but e2e the pipeline
runs at 100.5 fps vs 100.9 fps with ``lax.sort`` — a wash. The 136-stage
network moves ~2 MB of VMEM traffic per stage across 4 operand arrays plus
32 full transposes, which lands at roughly the generic sort's cost; the
estimated 10x headroom did not materialize. ``lax.sort`` stays the default
(``pipeline.voxel_order="sort"``); this kernel remains available as
``voxel_order="pallas-sort"`` and as the repo's worked example of
VMEM-resident Pallas sorting. Compile cost: ~7 min (Mosaic, unrolled).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _exchange(arrs, imap, j_rows, k, out_shape):
    """One compare-exchange stage at ROW distance ``j_rows`` of the current
    layout; ``imap`` carries each position's original flat index."""
    rows, cols = out_shape
    g = rows // (2 * j_rows)
    shape = (g, 2, j_rows, cols)
    K = arrs[0].reshape(shape)
    I = arrs[1].reshape(shape)
    swap = (K[:, 0] > K[:, 1]) | ((K[:, 0] == K[:, 1]) & (I[:, 0] > I[:, 1]))
    desc = (imap.reshape(shape)[:, 0] & k) != 0
    swap = swap ^ desc
    out = []
    for v in arrs:
        v = v.reshape(shape)
        lo = jnp.where(swap, v[:, 1], v[:, 0])
        hi = jnp.where(swap, v[:, 0], v[:, 1])
        out.append(jnp.stack([lo, hi], axis=1).reshape(out_shape))
    return out


def _sort_kernel(key_ref, p1_ref, p2_ref, okey_ref, op1_ref, op2_ref,
                 *, n: int):
    rows = n // _LANES

    # original-index maps for each domain (i = r*128 + c in N)
    imap_n = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
              + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    imap_t = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, rows), 1) * _LANES
              + jax.lax.broadcasted_iota(jnp.int32, (_LANES, rows), 0))

    # start in T-domain: every k-level <= 128 runs entirely there, and idx
    # initializes to the index map for free
    arrs = [key_ref[:].T, imap_t, p1_ref[:].T, p2_ref[:].T]
    domain_t = True

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            if j < _LANES:
                if not domain_t:
                    arrs = [a.T for a in arrs]
                    domain_t = True
                arrs = _exchange(arrs, imap_t, j, k, (_LANES, rows))
            else:
                if domain_t:
                    arrs = [a.T for a in arrs]
                    domain_t = False
                arrs = _exchange(arrs, imap_n, j // _LANES, k, (rows, _LANES))
            j //= 2
        k *= 2

    if domain_t:
        arrs = [a.T for a in arrs]
    okey_ref[:] = arrs[0]
    op1_ref[:] = arrs[2]
    op2_ref[:] = arrs[3]


def bitonic_sort_pallas(key: jnp.ndarray, payloads: Sequence[jnp.ndarray],
                        interpret: Optional[bool] = None
                        ) -> Tuple[jnp.ndarray, ...]:
    """Stable ascending sort by ``key``; exactly two f32 payloads.

    n must be a power of two and a multiple of 128^2/... (>= 256).
    """
    n = key.shape[0]
    assert n & (n - 1) == 0 and n >= 256, n
    p1, p2 = payloads
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows = n // _LANES

    kernel = functools.partial(_sort_kernel, n=n)
    shape2 = (rows, _LANES)
    okey, op1, op2 = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.int32),
                   jax.ShapeDtypeStruct(shape2, jnp.float32),
                   jax.ShapeDtypeStruct(shape2, jnp.float32)],
        interpret=interpret,
    )(key.reshape(shape2),
      p1.astype(jnp.float32).reshape(shape2),
      p2.astype(jnp.float32).reshape(shape2))
    return okey.reshape(n), op1.reshape(n), op2.reshape(n)
