"""Microbenchmarks for the stage-1 probe bottleneck (round 4).

The axon remote backend doesn't block on block_until_ready, so every
benchmark chains R dependent iterations of the op inside one jit and
fetches a scalar with device_get; per-op time = (t - t_null) / R.

Run: python tools/probe_microbench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R_ITERS = 16


def bench(make_step, init_carry, label, work=None, n=3, r=R_ITERS):
    """make_step: carry -> carry (data-dependent chain). Returns s/op."""

    @jax.jit
    def run(c):
        c = jax.lax.fori_loop(0, r, lambda i, c: make_step(c), c)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x[..., :1]).astype(jnp.float32), c, 0.0)

    best = float("inf")
    for _ in range(n + 1):
        t0 = time.perf_counter()
        jax.device_get(run(init_carry))
        best = min(best, time.perf_counter() - t0)
    per = best / r
    extra = f"  {work/per/1e6:8.1f} Mrows/s" if work else ""
    print(f"{label:46s} {per*1e3:9.3f} ms{extra}")
    return per


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    NP = 4_000_000

    # null chain to estimate loop overhead
    x0 = jnp.zeros((8, 128), jnp.float32)
    bench(lambda c: c + 1.0, x0, "null chain")

    # ---- gather rate vs width/table size
    for nrows, width in [(2 << 20, 5), (32 << 20, 5)]:
        tab = jnp.asarray(rng.integers(0, 2**32, (nrows, width), np.uint32))
        idx0 = jnp.asarray(rng.integers(0, nrows, NP, np.int64)
                           .astype(np.int32))

        def step(c, nrows=nrows):
            # table rides in the carry: a closure constant this size blows
            # the remote-compile payload cap
            tab, idx, acc = c
            rows = tab[idx]
            s = jnp.sum(rows, dtype=jnp.uint32)
            idx = (idx + (s & 1).astype(jnp.int32)) % nrows
            return tab, idx, acc + s[None].astype(jnp.float32)

        bench(step, (tab, idx0, jnp.zeros(1, jnp.float32)),
              f"gather [{nrows>>20}M rows x {width} u32] 4M idx", work=NP)
        del tab, idx0

    # ---- sort costs
    keys0 = jnp.asarray(rng.integers(0, 2**31, NP).astype(np.int32))
    pay0 = jnp.asarray(rng.integers(0, 2**31, NP).astype(np.int32))

    def sstep1(c):
        k, acc = c
        ks = jax.lax.sort(k)
        return ks[::-1], acc + ks[:1].astype(jnp.float32)

    bench(sstep1, (keys0, jnp.zeros(1, jnp.float32)), "sort 4M u32 key")

    def sstep2(c):
        k, p, acc = c
        ks, ps = jax.lax.sort((k, p), num_keys=1)
        return ks[::-1], ps, acc + ps[:1].astype(jnp.float32)

    bench(sstep2, (keys0, pay0, jnp.zeros(1, jnp.float32)),
          "sort 4M u32 key + 1 payload")

    for sz in (1_000_000, 500_000, 250_000):
        bench(sstep2, (keys0[:sz], pay0[:sz], jnp.zeros(1, jnp.float32)),
              f"sort {sz//1000}k key + 1 payload")

    # 2-key sort (event probe shape)
    def sstep3(c):
        k, p, acc = c
        ks, ps = jax.lax.sort((k, p), num_keys=2)
        return ks[::-1], ps, acc + ps[:1].astype(jnp.float32)

    bench(sstep3, (keys0[:250_000], pay0[:250_000], jnp.zeros(1, jnp.float32)),
          "2-key sort 250k")

    # ---- scatter
    vals6 = jnp.asarray(rng.integers(0, 2**32, (NP, 6), np.uint32))
    pidx0 = jnp.asarray(rng.permutation(NP).astype(np.int32))

    def scstep(c):
        idx, acc = c
        out = jnp.zeros((NP, 6), jnp.uint32).at[idx].set(
            vals6, mode="drop", unique_indices=True)
        s = jnp.sum(out[:2], dtype=jnp.uint32)
        idx = (idx + (s & 1).astype(jnp.int32)) % NP
        return idx, acc + s[None].astype(jnp.float32)

    bench(scstep, (pidx0, jnp.zeros(1, jnp.float32)),
          "scatter [4M x 6 u32]", work=NP)

    # ---- segment_sum sorted 4M -> 32k
    seg = jnp.asarray(np.sort(rng.integers(0, 32768, NP)).astype(np.int32))

    def ssum(c):
        v, acc = c
        o = jax.ops.segment_sum(v, seg, num_segments=32768,
                                indices_are_sorted=True)
        return v + o[:1], acc + o[:1].astype(jnp.float32)

    bench(ssum, (jnp.ones(NP, jnp.int32), jnp.zeros(1, jnp.float32)),
          "segment_sum 4M->32k sorted")

    # ---- onehot matmul join
    T, Rr, Wp = 1024, 512, 20
    NT = NP // T
    lrow0 = jnp.asarray(rng.integers(0, Rr, (NT, T)).astype(np.int32))
    chunk = jnp.asarray(rng.integers(0, 255, (NT, Rr, Wp))
                        .astype(np.float32)).astype(jnp.bfloat16)

    def ohstep(c):
        lr, acc = c
        oh = (lr[..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, Rr), 2)
              ).astype(jnp.bfloat16)
        out = jnp.einsum("ntr,nrw->ntw", oh, chunk,
                         preferred_element_type=jnp.float32)
        s = jnp.sum(out[0, 0])
        lr = (lr + s.astype(jnp.int32) % 2) % Rr
        return lr, acc + s[None]

    bench(ohstep, (lrow0, jnp.zeros(1, jnp.float32)),
          f"onehot join 4M x {Rr} rows x {Wp} u8planes", work=NP)

    # ---- Pallas DMA row-gather prototype
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrows, width = 2 << 20, 5
    tab = jnp.asarray(rng.integers(0, 2**32, (nrows, width), np.uint32))

    for TROWS in (256, 512):
        def dma_kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
            def issue(j, _):
                r = idx_ref[j]
                pltpu.make_async_copy(
                    hbm_ref.at[r], scratch.at[j], sems.at[j]).start()
                return 0

            jax.lax.fori_loop(0, TROWS, issue, 0)

            def wait(j, _):
                r = idx_ref[j]
                pltpu.make_async_copy(
                    hbm_ref.at[r], scratch.at[j], sems.at[j]).wait()
                return 0

            jax.lax.fori_loop(0, TROWS, wait, 0)
            out_ref[:] = scratch[:]

        def dma_gather(tab, idx, TROWS=TROWS, kern=dma_kernel):
            n = idx.shape[0]
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n // TROWS,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec(
                        (TROWS, tab.shape[1]), lambda i, idx_ref: (i, 0)),
                    scratch_shapes=[
                        pltpu.VMEM((TROWS, tab.shape[1]), jnp.uint32),
                        pltpu.SemaphoreType.DMA((TROWS,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((n, tab.shape[1]), jnp.uint32),
            )(idx, tab)

        NSMALL = 1 << 20
        idx0 = jnp.asarray(rng.integers(0, nrows, NSMALL).astype(np.int32))

        def dstep(c, TROWS=TROWS):
            idx, acc = c
            rows = dma_gather(tab, idx)
            s = jnp.sum(rows[:8], dtype=jnp.uint32)
            idx = (idx + (s & 1).astype(jnp.int32)) % nrows
            return idx, acc + s[None].astype(jnp.float32)

        try:
            bench(dstep, (idx0, jnp.zeros(1, jnp.float32)),
                  f"pallas DMA gather [1M x 5 u32] tile {TROWS}",
                  work=NSMALL, r=4)
        except Exception as e:  # noqa: BLE001
            print(f"pallas DMA tile {TROWS} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
