"""Primitive cost survey on the TPU relay: fat gather, scatter, sort, top_k,
cumsum, device->host transfer. Guides the probe v2 design."""

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
    C0 = 4
    tab = jnp.asarray(
        rng.integers(0, 2**32, size=(NROWS * C0, 2), dtype=np.uint64)
        .astype(np.uint32))
    N = 4096 * 124
    rows = jnp.asarray(rng.integers(0, NROWS, size=N).astype(np.int32))

    def case(name, f, *args, iters=6):
        jf = jax.jit(f)
        t0 = time.time()
        jax.block_until_ready(jf(*args))
        ct = time.time() - t0
        mn, md = timeit(jf, iters, *args)
        print(f"[pc] {name:20s} compile {ct:5.1f}s  min {mn*1e3:7.2f} ms",
              file=sys.stderr)

    def fat_gather(r):
        js = jnp.arange(C0, dtype=jnp.int32)
        idx = r[:, None] * C0 + js[None, :]
        vals = tab[idx]                      # [N, C0, 2]
        return jnp.sum(vals, dtype=jnp.uint32)

    case("fat_gather[N,4,2]", fat_gather, rows)

    def fat_gather2(r):
        """Both strands concatenated: one kernel, 2N probes."""
        r2 = jnp.concatenate([r, r])
        js = jnp.arange(C0, dtype=jnp.int32)
        idx = r2[:, None] * C0 + js[None, :]
        return jnp.sum(tab[idx], dtype=jnp.uint32)

    case("fat_gather[2N,4,2]", fat_gather2, rows)

    vals = jnp.asarray(rng.integers(0, 2**31, size=N).astype(np.int32))
    segs = jnp.asarray(np.sort(rng.integers(0, 4096, size=N)).astype(np.int32))

    def scat(v, s):
        return jnp.zeros((4096, 24, 5), jnp.int32).at[s, v % 24, v % 5].add(1)

    case("scatter3d[N]", scat, vals, segs)

    def segsum(v, s):
        return jax.ops.segment_sum(v, s, num_segments=4096,
                                   indices_are_sorted=True)

    case("segment_sum[N]", segsum, vals, segs)

    keys = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint64)
                       .astype(np.uint32))

    def sort2(kk, v):
        return jax.lax.sort((kk, v), num_keys=1)[1][:8]

    case("sort[N]+payload", sort2, keys, vals)

    def topk(v):
        return jax.lax.top_k(v, 8192)[0][:8]

    case("top_k8192[196k]", topk, vals[:196608])

    def cums(v):
        return jnp.cumsum(v)[-8:]

    case("cumsum[N]", cums, vals)

    def onehot_hist(v, s):
        oh = (v[:, None] % 24 == jnp.arange(24)[None, :]).astype(jnp.bfloat16)
        seg_oh = (s[:, None] == jnp.arange(4096)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(seg_oh, oh, (((0,), (0,)), ((), ())))[:4, :4]

    case("onehot_matmul_hist", onehot_hist, vals, segs)

    # device -> host transfer rates
    for mb, dt in ((4, jnp.float64), (4, jnp.float32), (16, jnp.float32)):
        n = mb * 1024 * 1024 // np.dtype(dt).itemsize
        arr = jnp.zeros(n, dt) + 1.0
        jax.block_until_ready(arr)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(arr))
            ts.append(time.perf_counter() - t0)
        mn = min(ts)
        print(f"[pc] d2h {mb}MB {np.dtype(dt).name:8s} min {mn*1e3:7.2f} ms "
              f"({mb/mn:6.1f} MB/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
