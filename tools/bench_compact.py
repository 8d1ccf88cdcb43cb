"""Compare compaction formulations on the live backend."""

import sys
import time

sys.path.insert(0, ".")

from krepp_tpu import configure

configure()

import jax
import jax.numpy as jnp
import numpy as np

from krepp_tpu.core.compact import _cumsum_1d

R = 8


def bench(label, fn, *args):
    f = jax.jit(fn, static_argnames="K")

    def chain():
        out = f(*args, K=KCAP)
        return out[0]

    t0 = time.time()
    jax.device_get(chain()[:1])
    first = time.time() - t0
    ts = []
    for _ in range(R):
        t0 = time.time()
        jax.device_get(chain()[:1])
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{label:38s} {ts[R // 2] * 1e3:8.2f} ms (first {first:.1f}s)",
          flush=True)


def sort_compact(mask, K):
    N = mask.shape[0]
    keys = jnp.where(mask, jax.lax.iota(jnp.int32, N), jnp.int32(N))
    idx = jax.lax.sort(keys)[:K]
    return idx, jnp.sum(mask.astype(jnp.int32))


def strided_sort(mask, K, blk=1024):
    N = mask.shape[0]
    nblk = (N + blk - 1) // blk
    share = max(8, -(-K // nblk))
    Kb = min(blk, share + int(5 * share ** 0.5) + 8)
    Npad = nblk * blk
    mpad = (mask if Npad == N else
            jnp.zeros((Npad,), bool).at[:N].set(mask))
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (blk, nblk), 0) * nblk
            + jax.lax.broadcasted_iota(jnp.int32, (blk, nblk), 1))
    keys = jnp.where(mpad.reshape(blk, nblk), gidx, jnp.int32(N)).T
    kept = jax.lax.sort(keys, dimension=1)[:, :Kb].reshape(-1)
    idx = jax.lax.sort(kept)[:K]
    return idx, jnp.sum(keys < N)


def rank_select(mask, K, search="manual"):
    N = mask.shape[0]
    nblk = (N + 31) // 32
    mpad = (mask if nblk * 32 == N else
            jnp.zeros((nblk * 32,), bool).at[:N].set(mask))
    sh = jnp.asarray(np.arange(32, dtype=np.uint32))
    words = jnp.sum(mpad.reshape(nblk, 32).astype(jnp.uint32) << sh[None, :],
                    axis=1, dtype=jnp.uint32)
    counts = jax.lax.population_count(words).astype(jnp.int32)
    csum = _cumsum_1d(counts)
    n_set = csum[-1]
    j = jnp.arange(K, dtype=jnp.int32)
    if search == "jnp":
        b = jnp.searchsorted(csum, j, side="right").astype(jnp.int32)
    else:
        lo = jnp.zeros((K,), jnp.int32)
        hi = jnp.full((K,), nblk, jnp.int32)
        steps = int(np.ceil(np.log2(max(nblk, 2))))
        for _ in range(steps):
            mid = (lo + hi) >> 1
            go_hi = csum[jnp.minimum(mid, nblk - 1)] <= j
            lo = jnp.where(go_hi, mid + 1, lo)
            hi = jnp.where(go_hi, hi, mid)
        b = lo
    bs = jnp.minimum(b, nblk - 1)
    base = jnp.where(bs > 0, csum[jnp.maximum(bs - 1, 0)], 0)
    r = j - base
    w = words[bs]
    off = jnp.zeros((K,), jnp.int32)
    for width in (16, 8, 4, 2, 1):
        c = jax.lax.population_count(
            w & jnp.uint32((1 << width) - 1)).astype(jnp.int32)
        hi2 = r >= c
        off = off + jnp.where(hi2, width, 0)
        r = r - jnp.where(hi2, c, 0)
        w = jnp.where(hi2, w >> width, w)
    idx = jnp.where(j < n_set, bs * 32 + off, jnp.int32(N))
    return idx, n_set


def words_only(mask, K):
    N = mask.shape[0]
    nblk = (N + 31) // 32
    mpad = (mask if nblk * 32 == N else
            jnp.zeros((nblk * 32,), bool).at[:N].set(mask))
    sh = jnp.asarray(np.arange(32, dtype=np.uint32))
    words = jnp.sum(mpad.reshape(nblk, 32).astype(jnp.uint32) << sh[None, :],
                    axis=1, dtype=jnp.uint32)
    return words, words


def cumsum_only(mask, K):
    words, _ = words_only(mask, K)
    counts = jax.lax.population_count(words).astype(jnp.int32)
    return _cumsum_1d(counts), counts


print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(0)
for N, dens, KCAP in [(4_063_232, 0.005, 28672), (393_216, 0.15, 131072)]:
    mask = jnp.asarray(rng.random(N) < dens)
    print(f"-- N={N} density={dens} K={KCAP}", flush=True)
    bench("flat sort", sort_compact, mask)
    bench("strided two-level sort", strided_sort, mask)
    bench("rank-select (manual search)", rank_select, mask)
    bench("rank-select (jnp.searchsorted)",
          lambda m, K: rank_select(m, K, search="jnp"), mask)
    bench("  words pack only", words_only, mask)
    bench("  words+popcount+cumsum", cumsum_only, mask)
