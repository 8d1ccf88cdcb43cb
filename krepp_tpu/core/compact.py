"""Mask-lane compaction without top_k.

lax.top_k over a 0/1 mask selects the first K set lanes (ties break by
ascending index) but costs O(N log K) — it dominates stage-2 at millions of
(read, leaf) lanes. The identical selection is one cumsum + one scatter.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_mask_indices(mask_flat, K: int):
    """Indices of the first K set lanes of mask_flat, in ascending order.

    Returns (idx [K] int32, n_set). Unfilled slots hold the sentinel N
    (out of bounds): gathers through them clamp to junk that callers must
    ignore, and scatters through them drop (mode='drop')."""
    N = mask_flat.shape[0]
    pos = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    posc = jnp.where(mask_flat & (pos < K), pos, K)
    idx = jnp.full((K,), N, jnp.int32).at[posc].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    return idx, pos[-1] + 1
