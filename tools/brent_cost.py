"""Brent solver: dense vs compacted lanes at production shapes (TPU)."""

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

    from krepp_tpu.core.llh import make_llh, brent_find_minima, brent_on_mask

    rng = np.random.default_rng(0)
    B, S, X = 4096, 24, 5
    N = 2 * B * S
    llh = make_llh(27, 11, 4)

    hist = jnp.asarray(rng.integers(0, 3, size=(N, X)).astype(np.float64))
    uc = jnp.asarray(rng.uniform(10, 120, size=N))
    rho = jnp.asarray(rng.uniform(0.3, 0.99, size=N))
    live = rng.random(N) < 0.073          # ~14k live lanes like the bench
    mask = jnp.asarray(live)

    def dense(h, u, r):
        d, v = brent_find_minima(lambda dd: llh(dd, h, u, r), (N,))
        return d[:4], v[:4]

    def compact(h, u, r, m):
        d, v = brent_on_mask(llh, h, u, r, m)
        return d[:4], v[:4]

    for name, fn, args in [("dense196k", dense, (hist, uc, rho)),
                           ("compact", compact, (hist, uc, rho, mask))]:
        jf = jax.jit(fn)
        t0 = time.time()
        jax.block_until_ready(jf(*args))
        ct = time.time() - t0
        mn, md = timeit(jf, 6, *args)
        print(f"[bc] {name:10s} compile {ct:6.1f}s  min {mn*1e3:8.2f} ms",
              file=sys.stderr)

    # how many iterations until all lanes converge?
    from krepp_tpu.core.llh import F, _TOLERANCE, _GOLDEN  # noqa: F401

    def iters_needed(h, u, r):
        d, v = brent_find_minima(lambda dd: llh(dd, h, u, r), (N,))
        return d, v

    # instrument: run brent with shrinking max_iter until result changes
    base = jax.jit(lambda h, u, r: brent_find_minima(
        lambda dd: llh(dd, h, u, r), (N,)))(hist, uc, rho)
    base_d = np.asarray(base[0])
    for mi in (24, 32, 40, 48, 64):
        dd = jax.jit(lambda h, u, r, mi=mi: brent_find_minima(
            lambda d_: llh(d_, h, u, r), (N,), max_iter=mi))(hist, uc, rho)
        diff = np.max(np.abs(np.asarray(dd[0]) - base_d))
        print(f"[bc] max_iter={mi}: max |d - d_200| = {diff:.2e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
