"""Second primitive survey: separate per-op floors from I/O artifacts."""

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

    def case(name, f, *args, iters=6):
        jf = jax.jit(f)
        t0 = time.time()
        jax.block_until_ready(jf(*args))
        ct = time.time() - t0
        mn, md = timeit(jf, iters, *args)
        print(f"[pc2] {name:24s} compile {ct:5.1f}s  min {mn*1e3:8.2f} ms",
              file=sys.stderr)

    # elementwise with big output: relay output-transfer probe
    big = jnp.asarray(rng.random(2 * 1024 * 1024).astype(np.float32))
    case("ew_bigout[8MB]", lambda x: x * 2.0 + 1.0, big)
    case("ew_smallout", lambda x: jnp.sum(x * 2.0 + 1.0), big)

    case("cumsum8k", lambda x: jnp.cumsum(x)[-4:], big[:8192])
    case("cumsum2M", lambda x: jnp.cumsum(x)[-4:], big)

    a = jnp.asarray(rng.random((1024, 1024)).astype(np.float32))
    case("matmul1k", lambda x: jnp.dot(x, x)[:2, :2], a)
    case("matmul128", lambda x: jnp.dot(x[:128, :128], x[:128, :128])[:2, :2], a)

    tab = jnp.asarray(rng.integers(0, 2**32, size=65536, dtype=np.uint64)
                      .astype(np.uint32))
    idx_t = jnp.asarray(rng.integers(0, 65536, size=1024).astype(np.int32))

    def loop_gather(i):
        def body(j, acc):
            return acc + jnp.sum(tab[jnp.minimum(i + j, 65535)],
                                 dtype=jnp.uint32)
        return jax.lax.while_loop(lambda c: c[0] < 4,
                                  lambda c: (c[0] + 1, body(c[0], c[1])),
                                  (jnp.int32(0), jnp.uint32(0)))[1]

    case("whileloop4_gather1k", loop_gather, idx_t)

    def loop_ew(x):
        def body(c):
            j, v = c
            return j + 1, v * 1.0001 + 0.1
        return jax.lax.while_loop(lambda c: c[0] < 40, body,
                                  (jnp.int32(0), x))[1][:4]

    case("whileloop40_ew[2M]", loop_ew, big)
    case("whileloop40_ew[8k]", loop_ew, big[:8192])

    # dynamic_slice with traced start (single)
    case("dynslice1", lambda i: jnp.sum(
        jax.lax.dynamic_slice(tab, (i[0] % 1000,), (4096,)),
        dtype=jnp.uint32), idx_t)

    # many dynamic slices via vmap (turns into gather)
    case("argsort64k", lambda x: jnp.argsort(x)[:4], tab)

    # device->host of real computed data
    out = jax.block_until_ready(jax.jit(lambda x: x * 3.0)(big))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        h = jax.device_get(out)
        _ = h[::65536].sum()
        ts.append(time.perf_counter() - t0)
    print(f"[pc2] d2h 8MB real          min {min(ts)*1e3:8.2f} ms "
          f"({8/min(ts):6.1f} MB/s)", file=sys.stderr)
    # host->device
    harr = np.random.default_rng(1).random(2 * 1024 * 1024).astype(np.float32)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(harr))
        ts.append(time.perf_counter() - t0)
    print(f"[pc2] h2d 8MB               min {min(ts)*1e3:8.2f} ms "
          f"({8/min(ts):6.1f} MB/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
