"""Mask-lane compaction without top_k.

lax.top_k over a 0/1 mask selects the first K set lanes (ties break by
ascending index) but costs O(N log K) — it dominates stage-2 at millions of
(read, leaf) lanes. The identical selection is one cumsum + one scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cumsum_1d(x):
    """Inclusive int32 cumsum; two-level blocked formulation.

    XLA lowers a flat multi-million-lane cumsum poorly on TPU (measured
    ~25 ms at 4M lanes); reshaping to [rows, 4096] makes the inner scan a
    lane-parallel axis-1 cumsum plus a tiny row-offset scan."""
    N = x.shape[0]
    BLK = 4096
    if N <= BLK:
        return jnp.cumsum(x, dtype=jnp.int32)
    rows = (N + BLK - 1) // BLK
    xp = jnp.zeros((rows * BLK,), jnp.int32).at[:N].set(x.astype(jnp.int32))
    x2 = xp.reshape(rows, BLK)
    within = jnp.cumsum(x2, axis=1, dtype=jnp.int32)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(within[:, -1], dtype=jnp.int32)[:-1]])
    return (within + offs[:, None]).reshape(-1)[:N]


def compact_mask_indices(mask_flat, K: int):
    """Indices of the first K set lanes of mask_flat, in ascending order.

    Returns (idx [K] int32, n_set). Unfilled slots hold the sentinel N
    (out of bounds): gathers through them clamp to junk that callers must
    ignore, and scatters through them drop (mode='drop').

    Formulated as a key sort of (set ? lane : N): measured 2x faster on
    TPU than the cumsum+scatter formulation at probe scale (the scatter's
    random-write issue rate is the bottleneck there)."""
    N = mask_flat.shape[0]
    keys = jnp.where(mask_flat, jax.lax.iota(jnp.int32, N), jnp.int32(N))
    idx = jax.lax.sort(keys)[:K]
    n_set = jnp.sum(mask_flat.astype(jnp.int32))
    return idx, n_set
