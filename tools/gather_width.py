"""Does gather cost scale with row width? [1M] indices from [2M, Wrow] u32."""

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

    rng = np.random.default_rng(0)
    NROWS = 2 * 1024 * 1024
    NIDX = 1_000_000
    idx = jnp.asarray(rng.integers(0, NROWS, size=NIDX).astype(np.int32))

    for wrow in (2, 8, 18, 36):
        tab = jnp.asarray(
            rng.integers(0, 2**32, size=(NROWS, wrow), dtype=np.uint64)
            .astype(np.uint32))

        def f(i, tab=tab):
            return jnp.sum(tab[i], dtype=jnp.uint32)

        jf = jax.jit(f)
        t0 = time.time()
        jax.block_until_ready(jf(idx))
        ct = time.time() - t0
        mn, md = timeit(jf, 6, idx)
        print(f"[gw] wrow={wrow:3d} ({4*wrow:4d}B rows) compile {ct:5.1f}s  "
              f"min {mn*1e3:7.2f} ms", file=sys.stderr)

    # simulated probe epilogue on the gathered rows (hd + bitplanes + hist)
    wrow = 18
    tab = jnp.asarray(rng.integers(0, 2**32, size=(NROWS, wrow),
                                   dtype=np.uint64).astype(np.uint32))
    res = jnp.asarray(rng.integers(0, 2**32, size=NIDX, dtype=np.uint64)
                      .astype(np.uint32))
    bp = (8192, NIDX // 8192)

    def probe_like(i, r):
        ent = tab[i].reshape(bp + (9, 2))
        enc = ent[..., 0]
        msk = ent[..., 1]
        rr = r.reshape(bp)
        z = jnp.bitwise_xor(enc, rr[..., None])
        folded = jnp.bitwise_and(jnp.bitwise_or(z, z >> 16), jnp.uint32(0xFFFF))
        hd = jax.lax.population_count(folded).astype(jnp.int32)
        match = (msk != 0) & (hd <= 4)
        gmin = jnp.min(jnp.where(match, hd, 255), axis=-1)
        seen = jnp.zeros(bp + (24,), jnp.uint32)
        hist = []
        for x in range(5):
            mx = jnp.where(match & (hd == x), msk, 0)
            plane = jnp.bitwise_or.reduce(mx, axis=-1) if hasattr(jnp.bitwise_or, "reduce") else mx[..., 0]
            for c in range(1, 9):
                plane = plane | mx[..., c]
            bits = (plane[..., None] >> jnp.arange(24, dtype=jnp.uint32)) & 1
            new = bits & (seen ^ 1)
            seen = seen | bits
            hist.append(jnp.sum(new, axis=1, dtype=jnp.int32))
        return jnp.stack(hist, -1), jnp.min(gmin, axis=-1)

    jf = jax.jit(probe_like)
    t0 = time.time()
    jax.block_until_ready(jf(idx, res))
    ct = time.time() - t0
    mn, md = timeit(jf, 6, idx, res)
    print(f"[gw] probe_like(C0=9)       compile {ct:5.1f}s  "
          f"min {mn*1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
