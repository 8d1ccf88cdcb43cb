"""Time probe variants on the current backend to locate the bottleneck.

Variants, each jitted separately over both strands (bench shapes):
  cur     : production probe (phase1 while_loop C=4 + top_k heavy tail)
  hashes  : codec hashes only
  scanN   : static unrolled scan to max_bucket, no heavy machinery
  compact : phase1 C=4 + cumsum-scatter heavy compaction (no top_k/argsort)

Usage: python tools/probe_variants.py [--batch 4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_dist import ensure_index, timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from krepp_tpu import configure

    configure()
    import jax
    import jax.numpy as jnp

    from krepp_tpu.core import codec
    from krepp_tpu.index import artifact
    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.engine import QueryEngine
    from krepp_tpu.query.bucket_scan import (_first_x_hist, _scan_loop,
                                             HD_SENTINEL, PHASE1_C)
    from krepp_tpu.testing import make_world_codes, sample_read_codes

    cache = os.path.expanduser(
        f"~/.cache/krepp_tpu_bench/idx-{args.seed}-24-500000")
    ensure_index(cache, seed=args.seed)
    built = artifact.load_native(cache)
    rng0 = np.random.default_rng(args.seed)
    _, genomes = make_world_codes(rng0, nleaves=24, glen=500_000, rate=0.05)
    di = DeviceIndex.from_built(built)
    engine = QueryEngine(di, hdist_th=4)
    th, W, S = engine.th, engine.W, engine.S
    X = th + 1
    lsh = engine.lsh
    print(f"[pv] max_bucket={di.max_bucket} device={jax.devices()[0]}",
          file=sys.stderr)

    rng = np.random.default_rng(args.seed + 1)
    B, rlen = args.batch, 150
    codes = jnp.asarray(sample_read_codes(rng, genomes, B, rlen=rlen))
    lengths = jnp.full((B,), rlen, jnp.int32)

    def hashes_only(codes, lengths):
        k = lsh.k
        P = codes.shape[1] - k + 1
        t_idx = jnp.arange(P, dtype=jnp.int32)
        valid = codec.window_valid(codes, k) & (t_idx[None, :] <= lengths[:, None] - k)
        outs = []
        for rix, res in ((codec.lsh_hash_or(codes, lsh), codec.residual_or(codes, lsh)),
                         (codec.lsh_hash_rc(codes, lsh), codec.residual_rc(codes, lsh))):
            outs.append(jnp.sum(rix.astype(jnp.uint32)) + jnp.sum(res))
        return outs[0] + outs[1], jnp.sum(valid)

    def strand_inputs(codes, lengths):
        k = lsh.k
        P = codes.shape[1] - k + 1
        t_idx = jnp.arange(P, dtype=jnp.int32)
        valid = codec.window_valid(codes, k) & (t_idx[None, :] <= lengths[:, None] - k)
        return ((codec.lsh_hash_or(codes, lsh), codec.residual_or(codes, lsh)),
                (codec.lsh_hash_rc(codes, lsh), codec.residual_rc(codes, lsh))), valid

    def scan_static(codes, lengths):
        """Unrolled static-depth scan to max_bucket; no heavy path."""
        (so, sr), valid = strand_inputs(codes, lengths)
        outs = []
        nk = max(engine._enc_se.shape[0], 1)
        for rix, res in (so, sr):
            start, cnt = engine._bucket_slices(rix, valid)
            gmin = jnp.full(res.shape, HD_SENTINEL, jnp.int32)
            Mm = jnp.zeros((X,) + res.shape + (W,), jnp.uint32)
            for j in range(di.max_bucket):
                idx = jnp.minimum(start + j, nk - 1)
                inb = j < cnt
                pair = engine._enc_se[idx]
                e = pair[..., 0]
                s = jnp.where(inb, pair[..., 1], 0).astype(jnp.int32)
                hd = codec.hdist_lr32(e, res)
                match = inb & (hd <= th)
                gmin = jnp.where(match, jnp.minimum(gmin, hd), gmin)
                msk = engine._mask[s]
                for x in range(X):
                    hit = (match & (hd == x))[..., None]
                    Mm = Mm.at[x].set(jnp.where(hit, Mm[x] | msk, Mm[x]))
            hist = _first_x_hist(Mm, engine._expand,
                                 jnp.ones(res.shape, jnp.uint32), th)
            outs.append((hist, jnp.min(gmin, axis=1)))
        return outs

    def scan_compact(codes, lengths):
        """phase1 C + cumsum-scatter heavy compaction (no top_k)."""
        (so, sr), valid = strand_inputs(codes, lengths)
        outs = []
        C = PHASE1_C
        for rix, res in (so, sr):
            start, cnt = engine._bucket_slices(rix, valid)
            B_, P_ = res.shape
            N = B_ * P_
            K = max(128, N // 64)
            gmin = jnp.full(res.shape, HD_SENTINEL, jnp.int32)
            Mm = jnp.zeros((X, B_, P_, W), jnp.uint32)
            Mm, gmin = _scan_loop(engine._enc_se, engine._mask, start, cnt,
                                  res, th, W, 0,
                                  jnp.minimum(jnp.max(cnt), C), Mm, gmin)
            minall = jnp.min(gmin, axis=1)
            is_heavy = (cnt > C).reshape(N)
            hist = _first_x_hist(Mm, engine._expand,
                                 jnp.logical_not(is_heavy.reshape(B_, P_))
                                 .astype(jnp.uint32), th)
            # cumsum compaction: slot of each heavy probe, row-major (sorted by b)
            slot = jnp.cumsum(is_heavy.astype(jnp.int32)) - 1
            nheavy = jnp.sum(is_heavy.astype(jnp.int32))
            overflow = nheavy > K
            tgt = jnp.where(is_heavy & (slot < K), slot, K)  # K = dump slot
            hidx = jnp.zeros((K + 1,), jnp.int32).at[tgt].set(
                jnp.arange(N, dtype=jnp.int32), mode="drop")[:K]
            took = jnp.arange(K) < nheavy
            hcnt = jnp.where(took, cnt.reshape(N)[hidx], 0)
            hstart = start.reshape(N)[hidx]
            hres = res.reshape(N)[hidx]
            b_of = (hidx // P_).astype(jnp.int32)
            hMm0 = jnp.zeros((X, K, W), jnp.uint32)
            hgmin0 = jnp.full((K,), HD_SENTINEL, jnp.int32)
            hmax = jnp.minimum(jnp.max(hcnt), di.max_bucket)
            hMm, hgmin = _scan_loop(engine._enc_se, engine._mask, hstart, hcnt,
                                    hres, th, W, C, hmax, hMm0, hgmin0)
            Mm_flat = Mm.reshape(X, N, W)
            merged = tuple(Mm_flat[x][hidx] | hMm[x] for x in range(X))
            live = took.astype(jnp.uint32)
            seen = None
            hist_extra = jnp.zeros((B_, S, X), jnp.int32)
            for x in range(X):
                bits = engine._expand(merged[x])
                if seen is None:
                    new = bits
                    seen = bits
                else:
                    new = bits & (seen ^ jnp.uint32(1))
                    seen = seen | bits
                contrib = (new * live[:, None]).astype(jnp.int32)
                seg = jax.ops.segment_sum(contrib, b_of, num_segments=B_,
                                          indices_are_sorted=True)
                hist_extra = hist_extra.at[:, :, x].add(seg)
            hist = hist + hist_extra
            hgmin = jnp.where(took, hgmin, HD_SENTINEL)
            minheavy = jax.ops.segment_min(hgmin, b_of, num_segments=B_,
                                           indices_are_sorted=True)
            outs.append((hist, jnp.minimum(minall, minheavy), overflow))
        return outs

    variants = [
        ("hashes", jax.jit(hashes_only)),
        ("scanN", jax.jit(scan_static)),
        ("compact", jax.jit(scan_compact)),
        ("cur", jax.jit(engine._probe_impl)),
    ]
    results = {}
    for name, fn in variants:
        t0 = time.time()
        out = fn(codes, lengths)
        jax.block_until_ready(out)
        ct = time.time() - t0
        mn, md = timeit(lambda c: fn(c, lengths), args.iters, codes)
        results[name] = out
        print(f"[pv] {name:8s} compile {ct:6.1f}s  min {mn*1e3:8.2f} ms  "
              f"med {md*1e3:8.2f} ms", file=sys.stderr)

    # cross-check hist equivalence cur vs scanN vs compact
    cur = jax.device_get(results["cur"])
    sn = jax.device_get(results["scanN"])
    cp = jax.device_get(results["compact"])
    ok1 = (np.array_equal(cur[0], sn[0][0]) and np.array_equal(cur[1], sn[1][0])
           and np.array_equal(cur[2], sn[0][1]) and np.array_equal(cur[3], sn[1][1]))
    ok2 = (np.array_equal(cur[0], cp[0][0]) and np.array_equal(cur[1], cp[1][0])
           and np.array_equal(cur[2], cp[0][1]) and np.array_equal(cur[3], cp[1][1]))
    print(f"[pv] parity scanN={ok1} compact={ok2}", file=sys.stderr)


if __name__ == "__main__":
    main()
