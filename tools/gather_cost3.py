"""Gather pathology isolation: x64 mode, loops, lowering variants.

Run twice: KREPP_X64=1 python tools/gather_cost3.py / KREPP_X64=0 ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_dist import timeit  # noqa: E402


def main():
    import jax

    if os.environ.get("KREPP_X64", "1") == "1":
        jax.config.update("jax_enable_x64", True)
        tag = "x64"
    else:
        tag = "x32"
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/krepp_tpu_jax"))
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    NT = 1 << 20
    tab = jnp.asarray(rng.integers(0, 2**32, size=NT, dtype=np.uint64)
                      .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NT, size=524288).astype(np.int32))

    def case(name, f, *args):
        jf = jax.jit(f)
        t0 = time.time()
        jax.block_until_ready(jf(*args))
        ct = time.time() - t0
        mn, md = timeit(jf, 6, *args)
        print(f"[g3-{tag}] {name:16s} compile {ct:5.1f}s  min {mn*1e3:7.2f} ms",
              file=sys.stderr)

    case("plain[524k]", lambda i: jnp.sum(tab[i], dtype=jnp.uint32), idx)
    case("take[524k]", lambda i: jnp.sum(jnp.take(tab, i, axis=0,
                                                  indices_are_sorted=False),
                                         dtype=jnp.uint32), idx)

    def loop8(i):
        def body(j, acc):
            return acc + jnp.sum(tab[jnp.minimum(i + j, NT - 1)],
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, 8, body, jnp.uint32(0))

    case("loop8x[524k]", loop8, idx)

    idx_small = idx[:1024]
    case("plain[1k]", lambda i: jnp.sum(tab[i], dtype=jnp.uint32), idx_small)

    def loop8_small(i):
        def body(j, acc):
            return acc + jnp.sum(tab[jnp.minimum(i + j, NT - 1)],
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, 8, body, jnp.uint32(0))

    case("loop8x[1k]", loop8_small, idx_small)


if __name__ == "__main__":
    main()
