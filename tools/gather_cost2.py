"""Gather scaling on TPU: cost vs index count, table size, sortedness."""

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

    def run(nidx, ntab, sort, iters=6):
        tab = jnp.asarray(rng.integers(0, 2**32, size=ntab, dtype=np.uint64)
                          .astype(np.uint32))
        idx = rng.integers(0, ntab, size=nidx).astype(np.int32)
        if sort:
            idx = np.sort(idx)
        idxd = jnp.asarray(idx)

        def f(i):
            return jnp.sum(tab[i], dtype=jnp.uint32)

        jf = jax.jit(f)
        t0 = time.time()
        jax.block_until_ready(jf(idxd))
        ct = time.time() - t0
        mn, md = timeit(jf, iters, idxd)
        print(f"[g2] nidx={nidx:>8} ntab={ntab:>8} sorted={int(sort)} "
              f"compile {ct:5.1f}s  min {mn*1e3:7.2f} ms", file=sys.stderr)

    for nidx in (1024, 16384, 131072, 524288, 2097152):
        run(nidx, 1 << 20, False)
    for ntab in (1024, 65536, 1 << 24):
        run(262144, ntab, False)
    run(524288, 1 << 20, True)

    # dynamic_slice chains: contiguous C-entry bucket reads per probe
    tab = jnp.asarray(rng.integers(0, 2**32, size=(1 << 20), dtype=np.uint64)
                      .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, (1 << 20) - 16, size=524288)
                      .astype(np.int32))

    def take_c(i):
        out = jnp.uint32(0)
        for j in range(4):
            out = out + jnp.sum(tab[i + j], dtype=jnp.uint32)
        return out

    jf = jax.jit(take_c)
    t0 = time.time()
    jax.block_until_ready(jf(idx))
    ct = time.time() - t0
    mn, md = timeit(jf, 6, idx)
    print(f"[g2] 4-slice chain 524288          compile {ct:5.1f}s  "
          f"min {mn*1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
