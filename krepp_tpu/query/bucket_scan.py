"""Two-phase LSH bucket scan -> per-(read, leaf) first-match histograms.

The probe work per strand:

  phase 1: a short fixed loop (C entries per bucket) accumulates per-probe
    OR-ed leaf bitmasks per Hamming distance for every probe; the per-read
    histogram of per-(position, leaf) minimum distances is then a masked
    bit-expansion + sum (no scatters). Probes with cnt > C are excluded
    here and handled by
  phase 2: the heavy tail, compacted with lax.top_k (K slots), scanned to
    its true depth, merged with its phase-1 masks by *gather*, and
    aggregated into the read histograms with sorted segment sums.

If more than K probes are heavy the jitted function reports it and the
engine falls back to an exact full-depth scan (scan_buckets_full).

Semantics == the reference's sequential per-position dedupe
(ref: src/query.hpp:153-176, src/query.cpp:352-390): min Hamming distance
per (read, position, leaf), counted once per position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import codec

HD_SENTINEL = 255
PHASE1_C = 4
HEAVY_FRACTION = 64  # K = N // HEAVY_FRACTION top-k slots for heavy probes


def make_expander(S: int, W: int):
    """mask [..., W] uint32 -> bits [..., S] uint32 (broadcast, gather-free)."""
    shifts = []
    for wd in range(W):
        lo = wd * 32
        hi = min(S, lo + 32)
        shifts.append(np.arange(lo, hi, dtype=np.uint32) % np.uint32(32))

    def expand(mask):
        outs = []
        for wd in range(W):
            outs.append((mask[..., wd: wd + 1] >> jnp.asarray(shifts[wd]))
                        & jnp.uint32(1))
        return jnp.concatenate(outs, axis=-1) if W > 1 else outs[0]

    return expand


def _scan_loop(enc_se, mask_tab, start, cnt, res, th, W, j0, j1_dyn,
               Mm, gmin):
    """Accumulate OR-masks/gmin for bucket entries j0 <= j < j1_dyn."""
    nk = max(enc_se.shape[0], 1)

    def body_at(j, carry):
        Mm, gmin = carry
        idx = jnp.minimum(start + j, nk - 1)
        inb = j < cnt
        pair = enc_se[idx]
        e = pair[..., 0]
        s = jnp.where(inb, pair[..., 1], 0).astype(jnp.int32)
        hd = codec.hdist_lr32(e, res)
        match = inb & (hd <= th)
        gmin = jnp.where(match, jnp.minimum(gmin, hd), gmin)
        msk = mask_tab[s]
        for x in range(th + 1):
            hit = (match & (hd == x))[..., None]
            Mm = Mm.at[x].set(jnp.where(hit, Mm[x] | msk, Mm[x]))
        return Mm, gmin

    def cond(carry):
        j, _, _ = carry
        return j < j1_dyn

    def wbody(carry):
        j, Mm, gmin = carry
        Mm, gmin = body_at(j, (Mm, gmin))
        return j + 1, Mm, gmin

    _, Mm, gmin = jax.lax.while_loop(cond, wbody, (jnp.int32(j0), Mm, gmin))
    return Mm, gmin


def _first_x_hist(Mm, expand, weight, th):
    """Mm [X, B, P, W] -> hist [B, S, X] of first-set-x per (p, leaf),
    weighted per probe by `weight` [B, P] (0/1)."""
    seen = None
    outs = []
    w = weight[..., None].astype(jnp.uint32)
    for x in range(th + 1):
        bits = expand(Mm[x])
        if seen is None:
            new = bits
            seen = bits
        else:
            new = bits & (seen ^ jnp.uint32(1))
            seen = seen | bits
        outs.append(jnp.sum((new * w).astype(jnp.int32), axis=1))
    return jnp.stack(outs, axis=-1)  # [B, S, X]


def probe_strand(enc_se, mask_tab, expand, start, cnt, res, th: int, W: int,
                 S: int, max_bucket: int):
    """Full strand probe. start/cnt/res: [B, P].

    Returns (hist [B, S, th+1] int32, minall [B] int32, overflow bool) —
    overflow set when the heavy tail exceeded the top-k capacity and the
    caller must re-run the exact fallback.
    """
    B, P = res.shape
    X = th + 1
    C = min(PHASE1_C, max_bucket)
    maxcnt = jnp.minimum(jnp.max(cnt), max_bucket)

    Mm0 = jnp.zeros((X, B, P, W), jnp.uint32)
    gmin0 = jnp.full((B, P), HD_SENTINEL, jnp.int32)
    Mm, gmin = _scan_loop(enc_se, mask_tab, start, cnt, res, th, W,
                          0, jnp.minimum(maxcnt, C), Mm0, gmin0)
    minall = jnp.min(gmin, axis=1)

    if max_bucket <= C:
        hist = _first_x_hist(Mm, expand, jnp.ones((B, P), jnp.uint32), th)
        return hist, minall, jnp.bool_(False)

    is_heavy = cnt > C
    hist = _first_x_hist(Mm, expand,
                         jnp.logical_not(is_heavy).astype(jnp.uint32), th)

    N = B * P
    K = max(128, N // HEAVY_FRACTION)
    cnt_f = cnt.reshape(N)
    nheavy = jnp.sum(is_heavy.astype(jnp.int32))
    overflow = nheavy > K

    hcnt, hidx = jax.lax.top_k(cnt_f, K)
    # sort by read id for sorted segment aggregation
    b_of = (hidx // P).astype(jnp.int32)
    order = jnp.argsort(b_of)
    hidx = hidx[order]
    hcnt = hcnt[order]
    b_of = b_of[order]
    hstart = start.reshape(N)[hidx]
    hres = res.reshape(N)[hidx]
    hMm0 = jnp.zeros((X, K, W), jnp.uint32)
    hgmin0 = jnp.full((K,), HD_SENTINEL, jnp.int32)
    hmax = jnp.minimum(jnp.max(hcnt), max_bucket)
    hMm, hgmin = _scan_loop(enc_se, mask_tab, hstart, hcnt, hres, th, W,
                            C, hmax, hMm0, hgmin0)
    # merge with the heavy probes' phase-1 masks (gather, no scatter)
    Mm_flat = Mm.reshape(X, N, W)
    merged = tuple(Mm_flat[x][hidx] | hMm[x] for x in range(X))
    really_heavy = (hcnt > C).astype(jnp.uint32)

    seen = None
    hist_extra = jnp.zeros((B, S, X), jnp.int32)
    for x in range(X):
        bits = expand(merged[x])
        if seen is None:
            new = bits
            seen = bits
        else:
            new = bits & (seen ^ jnp.uint32(1))
            seen = seen | bits
        contrib = (new * really_heavy[:, None]).astype(jnp.int32)
        seg = jax.ops.segment_sum(contrib, b_of, num_segments=B,
                                  indices_are_sorted=True)
        hist_extra = hist_extra.at[:, :, x].add(seg)
    hist = hist + hist_extra

    hgmin = jnp.where(really_heavy.astype(bool), hgmin, HD_SENTINEL)
    minheavy = jax.ops.segment_min(hgmin, b_of, num_segments=B,
                                   indices_are_sorted=True)
    minall = jnp.minimum(minall, minheavy)
    return hist, minall, overflow


def probe_strand_full(enc_se, mask_tab, expand, start, cnt, res, th: int,
                      W: int, S: int, max_bucket: int):
    """Exact full-depth scan (fallback when the heavy tail overflows)."""
    B, P = res.shape
    X = th + 1
    maxcnt = jnp.minimum(jnp.max(cnt), max_bucket)
    Mm0 = jnp.zeros((X, B, P, W), jnp.uint32)
    gmin0 = jnp.full((B, P), HD_SENTINEL, jnp.int32)
    Mm, gmin = _scan_loop(enc_se, mask_tab, start, cnt, res, th, W,
                          0, maxcnt, Mm0, gmin0)
    hist = _first_x_hist(Mm, expand, jnp.ones((B, P), jnp.uint32), th)
    return hist, jnp.min(gmin, axis=1)


def scan_buckets_min(enc_v, start, cnt, res, th: int, max_bucket: int):
    """Color-less variant for seek: min Hamming distance per probe
    (ref: src/seek.cpp:103-119)."""
    nk = max(enc_v.shape[0], 1)

    def body(j, gmin):
        idx = jnp.minimum(start + j, nk - 1)
        inb = j < cnt
        hd = codec.hdist_lr32(enc_v[idx], res)
        return jnp.where(inb, jnp.minimum(gmin, hd), gmin)

    maxcnt = jnp.minimum(jnp.max(cnt), max_bucket)

    def cond(carry):
        j, _ = carry
        return j < maxcnt

    def wbody(carry):
        j, gmin = carry
        return j + 1, body(j, gmin)

    gmin0 = jnp.full(res.shape, HD_SENTINEL, jnp.int32)
    _, gmin = jax.lax.while_loop(cond, wbody, (jnp.int32(0), gmin0))
    return jnp.where(gmin <= th, gmin, HD_SENTINEL)
