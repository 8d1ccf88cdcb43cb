"""Heavy-tail sub-stage timings (round 4)."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from krepp_tpu import configure

    configure()
    import jax
    import jax.numpy as jnp

    import bench
    from krepp_tpu.core import codec
    from krepp_tpu.core.compact import compact_mask_indices

    engine = bench.load_engine("base")
    B = 16384
    codes = bench.world_reads("base", B)
    lengths = np.full(B, 150, np.int32)
    packed, vbits = codec.pack_codes_host(codes, lengths)
    tables = engine._tables
    slots_d, enc_se, row_start, row_ids, mask_tab = tables

    def timeit(label, fn, *args, reps=4):
        t0 = time.time()
        out = fn(*args)
        x = out[0] if isinstance(out, (tuple, list)) else out
        jax.device_get(x.ravel()[0])
        print(f"[tail] {label}: first {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            x = out[0] if isinstance(out, (tuple, list)) else out
            jax.device_get(x.ravel()[0])
            ts.append(time.time() - t0)
        ts.sort()
        print(f"[tail] {label}: {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)

    # realistic heavy flags
    codes_d = jax.jit(lambda p, l: codec.unpack_codes(
        p, l, p.shape[1] * 16, None))(jnp.asarray(packed),
                                      jnp.asarray(lengths))
    pre = jax.jit(lambda c, l: engine._strand_hashes(c, l))
    rix2, res2, valid, onmers = pre(codes_d, jnp.asarray(lengths))
    urow_f = jax.jit(lambda r, v: engine._urow(r, v[None]))
    urow, resident = urow_f(rix2, valid)
    d = jax.device_get(jnp.zeros(1))  # sync-ish

    @jax.jit
    def heavy_flags(urow, resident):
        d = slots_d[urow if row_ids is None else urow]  # dense space
        cnt = jnp.where(resident, d[..., 0].astype(jnp.int32), 0)
        return (cnt > engine.C0).reshape(-1), cnt

    hf, cnt = heavy_flags(urow, resident)
    jax.device_get(hf.ravel()[0])
    Np = hf.shape[0] * 1
    Np = int(np.prod(hf.shape))
    K = min(Np, max(1024, Np // 16))
    print(f"[tail] Np={Np} K={K} nheavy={int(jax.device_get(hf.sum()))}",
          flush=True)

    timeit("compact_mask_indices 4M->K",
           jax.jit(lambda f: compact_mask_indices(f, K)), hf)

    hidx, _n = jax.jit(lambda f: compact_mask_indices(f, K))(hf)
    hrow = urow.reshape(-1)
    hres = res2.reshape(-1)

    @jax.jit
    def prep(hidx, hrow, hres):
        hurow = hrow[hidx]
        hres_c = hres[hidx]
        start = row_start[hurow]
        hcnt = (row_start[hurow + 1] - start).astype(jnp.int32)
        return start, hcnt, hres_c

    timeit("tail prep (3 gathers K)", prep, hidx, hrow, hres)
    start, hcnt, hres_c = prep(hidx, hrow, hres)
    jax.device_get(start.ravel()[0])

    MB = 9
    th = engine.th
    X = th + 1

    @jax.jit
    def tierA(start, hcnt, hres_c):
        nk = enc_se.shape[0]
        jj = jnp.arange(MB, dtype=jnp.int32)
        idx = jnp.minimum(start[:, None] + jj[None, :], nk - 1)
        pair = enc_se[idx]
        hd = codec.hdist_lr32(pair[..., 0], hres_c[:, None])
        inb = jj[None, :] < jnp.minimum(hcnt, MB)[:, None]
        match = inb & (hd <= th)
        sev = jnp.where(match, pair[..., 1], 0).astype(jnp.int32)
        msk = mask_tab[sev]
        acc = jnp.zeros((K, mask_tab.shape[1]), jnp.uint32)
        planes = []
        for x in range(X):
            hitx = (match & (hd == x))[..., None]
            sel = jnp.where(hitx, msk, 0)
            plane = sel[:, 0]
            for j in range(1, MB):
                plane = plane | sel[:, j]
            planes.append(plane)
        return jnp.stack(planes)

    timeit("tierA gathers+planes", tierA, start, hcnt, hres_c)

    @jax.jit
    def tierA_nogather(start, hcnt, hres_c):
        # same math, entries faked (no enc_se/mask gathers)
        jj = jnp.arange(MB, dtype=jnp.int32)
        pair = (start[:, None] + jj[None, :])[..., None] * jnp.ones(
            (1, 1, 2), jnp.int64 if False else jnp.uint32)
        hd = codec.hdist_lr32(pair[..., 0].astype(jnp.uint32),
                              hres_c[:, None])
        inb = jj[None, :] < jnp.minimum(hcnt, MB)[:, None]
        match = inb & (hd <= th)
        msk = (pair[..., 1] & jnp.uint32(0xFFFFFF))[..., None]
        planes = []
        for x in range(X):
            hitx = (match & (hd == x))[..., None]
            sel = jnp.where(hitx, msk, 0)
            plane = sel[:, 0]
            for j in range(1, MB):
                plane = plane | sel[:, j]
            planes.append(plane)
        return jnp.stack(planes)

    timeit("tierA NO gathers", tierA_nogather, start, hcnt, hres_c)

    Mm = tierA(start, hcnt, hres_c)
    jax.device_get(Mm.ravel()[0])
    N = 2 * B
    P = Np // N
    seg = jnp.minimum(hidx // P, N - 1).astype(jnp.int32)
    live = hidx < Np

    @jax.jit
    def segments(Mm, seg, live):
        hist = jnp.zeros((N, engine.S, X), jnp.int32)
        seen = None
        w_live = live.astype(jnp.uint32)
        for x in range(X):
            bits = engine._expand(Mm[x])
            if seen is None:
                new = bits
                seen = bits
            else:
                new = bits & (seen ^ jnp.uint32(1))
                seen = seen | bits
            contrib = (new * w_live[:, None]).astype(jnp.int32)
            hist = hist.at[:, :, x].add(jax.ops.segment_sum(
                contrib, seg, num_segments=N, indices_are_sorted=True))
        return hist

    timeit("tail segment block", segments, Mm, seg, live)


if __name__ == "__main__":
    main()
