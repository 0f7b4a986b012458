"""Bitonic sort as a dense XLA program — built to outrun ``jax.lax.sort``.

Motivation (measured, round 2, v5e): ``jax.lax.sort`` of 65k (i32, f32, f32)
operands costs 3.6 ms/frame — the single largest stage of the whole detection
pipeline (docs/PALLAS_NOTES.md). XLA's generic sort lowers to a
comparator-loop custom call that doesn't vectorize well on the VPU.

This implementation expresses Batcher's bitonic network as 136 (for 2^16)
purely elementwise stages. The classic ``partner = i XOR j`` exchange is
rewritten as a reshape: viewing the array as ``(n/(2j), 2, j)``, the partner
pair sits on axis 1, so each stage is a compare + two selects — no gathers,
no scatters, no dynamic indexing anywhere.

MEASURED RESULT (round 2, v5e, e2e): this *pure-jnp* formulation is SLOWER
than ``lax.sort`` (17.0 vs 9.9 ms/frame full-pipeline) — the stages with
pair distance j < 128 reshape at sub-lane granularity, which XLA lowers to
strided relayout copies instead of cheap selects. The arithmetic is an order
of magnitude under the generic sort, but the data movement isn't. The
network itself is validated here (bit-identical detections); making it fast
requires the Pallas version that keeps everything VMEM-resident and handles
j < 128 stages in a transposed domain where the exchange distance lands on
the sublane axis (ops/sort_pallas.py).

Stability: instead of relying on a stable network (bitonic is not stable),
the original index rides along as an explicit secondary key, making the
comparator a strict weak order on unique pairs — the result is EXACTLY the
stable ascending-by-key permutation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def bitonic_sort_stable(key: jnp.ndarray, payloads: Sequence[jnp.ndarray]
                        ) -> Tuple[jnp.ndarray, ...]:
    """Stable ascending sort by ``key`` (i32/f32 1-D, power-of-two length).

    Returns (sorted_key, *sorted_payloads) — the same result as
    ``jax.lax.sort((key, iota, *payloads), num_keys=2)`` with the iota
    dropped.
    """
    n = key.shape[0]
    assert n & (n - 1) == 0, f"bitonic sort needs a power-of-two size, got {n}"
    idx = jnp.arange(n, dtype=jnp.int32)
    arrs = [key, idx, *payloads]

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            nrows = n // (2 * j)
            views = [a.reshape(nrows, 2, j) for a in arrs]
            klo, khi = views[0][:, 0], views[0][:, 1]
            ilo, ihi = views[1][:, 0], views[1][:, 1]
            swap = (klo > khi) | ((klo == khi) & (ilo > ihi))
            # descending half-blocks: (i & k) != 0; constant over the low
            # log2(2j) index bits, so a per-row column suffices
            desc = (((jnp.arange(nrows, dtype=jnp.int32) * (2 * j)) & k) != 0)
            swap = swap ^ desc[:, None]
            arrs = [
                jnp.stack([jnp.where(swap, v[:, 1], v[:, 0]),
                           jnp.where(swap, v[:, 0], v[:, 1])],
                          axis=1).reshape(n)
                for v in views]
            j //= 2
        k *= 2
    return (arrs[0], *arrs[2:])
