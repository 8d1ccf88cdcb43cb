"""Measure TPU gather cost at probe-loop shapes to guide the probe design."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_dist import timeit  # noqa: E402


def main():
    from krepp_tpu import configure

    configure()
    import jax
    import jax.numpy as jnp

    NK = 1_165_849
    rng = np.random.default_rng(0)
    table2 = jnp.asarray(rng.integers(0, 2**32, size=(NK, 2), dtype=np.uint64)
                         .astype(np.uint32))
    table1 = table2[:, 0]

    B, P = 4096, 124
    N = B * P
    idx_full = jnp.asarray(rng.integers(0, NK, size=(B, P)).astype(np.int32))
    idx_flat = idx_full.reshape(N)
    idx_small = idx_flat[: N // 4]

    def g_pair(idx):
        return jnp.sum(table2[idx], dtype=jnp.uint32)

    def g_one(idx):
        return jnp.sum(table1[idx], dtype=jnp.uint32)

    def g_pair4(idx):
        acc = jnp.uint32(0)
        for j in range(4):
            acc = acc + jnp.sum(table2[jnp.minimum(idx + j, NK - 1)],
                                dtype=jnp.uint32)
        return acc

    def slice4(idx):
        """Per-probe contiguous 4-entry slices via strided gather of pairs."""
        js = jnp.arange(4, dtype=jnp.int32)
        idx4 = jnp.minimum(idx[:, None] + js[None, :], NK - 1)
        return jnp.sum(table2[idx4], dtype=jnp.uint32)

    cases = [
        ("pair[BP]", lambda: g_pair(idx_full)),
        ("pair[N]", lambda: g_pair(idx_flat)),
        ("pair[N/4]", lambda: g_pair(idx_small)),
        ("one[N]", lambda: g_one(idx_flat)),
        ("pair4x[N]", lambda: g_pair4(idx_flat)),
        ("slice4[N]", lambda: slice4(idx_flat)),
        ("slice4[N/4]", lambda: slice4(idx_small)),
    ]
    for name, fn in cases:
        jfn = jax.jit(fn)
        t0 = time.time()
        jax.block_until_ready(jfn())
        ct = time.time() - t0
        mn, md = timeit(lambda: jfn(), 8)
        print(f"[g] {name:12s} compile {ct:5.1f}s  min {mn*1e3:7.2f} ms  "
              f"med {md*1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
