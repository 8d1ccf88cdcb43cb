"""Query engines: batched LSH probe + histogram + ML distance on device.

Pipeline (replacing the reference's per-read, per-k-mer branchy loops,
ref: src/query.cpp:40-94,352-390):

  stage 1 (int32, device): for every (read, position, strand) compute the
    LSH row + residual, slice the bucket from the flat CSR, compute Hamming
    distances to all entries, and OR together the leaf bitmasks of matching
    colors per distance value. A segment-min over distance then yields, for
    each (read, leaf, strand), the histogram of per-position minimum
    distances — the order-independent reformulation of Minfo::update_match
    (ref: src/query.hpp:153-176).

  stage 2 (f64): apply the hdist_filt candidate filter
    (ref: src/query.cpp:96-139), run the batched Brent ML solver per
    (read, leaf, strand), and resolve strands.

  stage 3 (place only): ancestor accumulation as a dense damping-weight
    matmul over the flattened placement tree + candidate stats
    (ref: src/query.cpp:218-333).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import codec
from ..core.llh import make_llh, brent_find_minima, F
from ..index.index import DeviceIndex, DeviceSketch, PlacementView

HD_SENTINEL = 255          # "no match" Hamming distance marker
D_MAX = np.finfo(np.float64).max  # Minfo d_llh default (ref: src/query.hpp:226)


class QueryEngine:
    """dist/place probe + leaf-level ML over one DeviceIndex."""

    def __init__(self, dindex: DeviceIndex, hdist_th: int = 4):
        self.di = dindex
        self.th = int(hdist_th)
        self.lsh = dindex.lsh
        self.S = dindex.nleafslots
        self.W = dindex.se_mask.shape[1]
        self._enc = jnp.asarray(dindex.enc_v)
        self._sev = jnp.asarray(dindex.se_v)
        self._row_start = jnp.asarray(dindex.row_start.astype(np.int32))
        self._mask = jnp.asarray(dindex.se_mask)
        self._resident = jnp.asarray(dindex.resident)
        self._rank = jnp.asarray(dindex.res_rank.astype(np.int32))
        self._rho_slot = jnp.asarray(dindex.rho_slot)
        self._llh = make_llh(self.lsh.k, self.lsh.h, self.th)
        self._probe_jit = jax.jit(self._probe_impl)
        self._stage2_jit = jax.jit(self._stage2_impl)
        self._full_jit = jax.jit(self._full_impl)

    # ------------------------------------------------------------- stage 1
    def _strand_probe(self, rix, res, valid, acc_shape):
        """Bucket scan for one strand; returns (Mm, gmin).

        Mm: [th+1, B, P, W] uint32 OR-ed leaf masks per Hamming distance.
        gmin: [B, P] int32 min matched distance (HD_SENTINEL if none).
        """
        th = self.th
        m = self.lsh.m
        R = self.di.R
        nk = max(self.di.nkmers, 1)
        rmod = (rix % jnp.uint32(m)).astype(jnp.int32)
        resident = self._resident[rmod] & valid
        rank = self._rank[rmod]
        urow = (rix // jnp.uint32(m)).astype(jnp.int32) * R + jnp.maximum(rank, 0)
        urow = jnp.where(resident, urow, 0)
        start = self._row_start[urow]
        cnt = jnp.where(resident, self._row_start[urow + 1] - start, 0)

        def body(j, carry):
            Mm, gmin = carry
            idx = jnp.minimum(start + j, nk - 1)
            inb = j < cnt
            e = self._enc[idx]
            s = jnp.where(inb, self._sev[idx], 0)
            hd = codec.hdist_lr32(e, res)
            match = inb & (hd <= th)
            gmin = jnp.where(match, jnp.minimum(gmin, hd), gmin)
            msk = self._mask[s]  # [B, P, W]
            for x in range(th + 1):
                hit = (match & (hd == x))[..., None]
                Mm = Mm.at[x].set(jnp.where(hit, Mm[x] | msk, Mm[x]))
            return Mm, gmin

        Mm0 = jnp.zeros((th + 1,) + acc_shape + (self.W,), jnp.uint32)
        gmin0 = jnp.full(acc_shape, HD_SENTINEL, jnp.int32)
        # loop only to the largest bucket actually hit by this batch (the
        # static max_bucket bound would be dominated by the most skewed
        # bucket of the whole index)
        maxcnt = jnp.minimum(jnp.max(cnt), self.di.max_bucket)

        def cond(carry):
            j, _, _ = carry
            return j < maxcnt

        def wbody(carry):
            j, Mm, gmin = carry
            Mm, gmin = body(j, (Mm, gmin))
            return j + 1, Mm, gmin

        _, Mm, gmin = jax.lax.while_loop(cond, wbody, (jnp.int32(0), Mm0, gmin0))
        return Mm, gmin

    def _hist_from_masks(self, Mm):
        """[th+1, B, P, W] masks -> per-leaf first-match histogram [B, S, th+1].

        minimum distance per (position, leaf) = first x whose mask bit is
        set; histogram = count over positions.
        """
        th = self.th
        S = self.S
        word = np.arange(S) // 32
        shift = jnp.asarray((np.arange(S) % 32).astype(np.uint32))
        hists = []
        seen = None
        for x in range(th + 1):
            bits = (Mm[x][..., word] >> shift) & jnp.uint32(1)  # [B, P, S]
            if seen is None:
                new = bits
                seen = bits
            else:
                new = bits & (seen ^ jnp.uint32(1))
                seen = seen | bits
            hists.append(jnp.sum(new, axis=1, dtype=jnp.int32))  # [B, S]
        return jnp.stack(hists, axis=-1)  # [B, S, th+1]

    def _probe_impl(self, codes, lengths):
        lsh = self.lsh
        k = lsh.k
        B, L = codes.shape
        P = L - k + 1
        t_idx = jnp.arange(P, dtype=jnp.int32)
        valid = codec.window_valid(codes, k) & (t_idx[None, :] <= lengths[:, None] - k)
        onmers = jnp.sum(valid, axis=1, dtype=jnp.int32)

        rix_or = codec.lsh_hash_or(codes, lsh)
        res_or = codec.residual_or(codes, lsh)
        rix_rc = codec.lsh_hash_rc(codes, lsh)
        res_rc = codec.residual_rc(codes, lsh)

        Mm_or, gmin_or = self._strand_probe(rix_or, res_or, valid, (B, P))
        Mm_rc, gmin_rc = self._strand_probe(rix_rc, res_rc, valid, (B, P))
        hist_or = self._hist_from_masks(Mm_or)
        hist_rc = self._hist_from_masks(Mm_rc)
        minall_or = jnp.min(gmin_or, axis=1)
        minall_rc = jnp.min(gmin_rc, axis=1)
        return hist_or, hist_rc, minall_or, minall_rc, onmers

    # ------------------------------------------------------------- stage 2
    def _optimize(self, hist, uc, rho):
        def f(d):
            return self._llh(d, hist, uc, rho)

        return brent_find_minima(f, uc.shape)

    def _stage2_impl(self, hist_or, hist_rc, minall_or, minall_rc, onmers,
                     leaf_ok):
        """Leaf-level filtering + ML + strand resolution
        (ref: src/query.cpp:96-139)."""
        th = self.th
        X = th + 1
        B = hist_or.shape[0]
        S = self.S
        xs = jnp.arange(X, dtype=jnp.int32)

        def leaf_stats(hist, minall):
            matchc = jnp.sum(hist, axis=-1)                       # [B, S]
            present = (matchc > 0) & leaf_ok[None, :]
            minhd = jnp.min(jnp.where(hist > 0, xs[None, None, :], HD_SENTINEL),
                            axis=-1)
            filt = jnp.where(minall < HD_SENTINEL, 2 * minall + 1,
                             jnp.int32(2 * HD_SENTINEL))
            keep = present & (minhd <= filt[:, None])
            return matchc, present, keep

        mc_or, pres_or, keep_or = leaf_stats(hist_or, minall_or)
        mc_rc, pres_rc, keep_rc = leaf_stats(hist_rc, minall_rc)

        uc_or = (onmers[:, None] - mc_or).astype(F)
        uc_rc = (onmers[:, None] - mc_rc).astype(F)
        rho = jnp.broadcast_to(self._rho_slot[None, :], (B, S)).astype(F)
        hist2 = jnp.concatenate([hist_or.astype(F), hist_rc.astype(F)], axis=0)
        uc2 = jnp.concatenate([uc_or, uc_rc], axis=0)
        rho2 = jnp.concatenate([rho, rho], axis=0)
        d2, v2 = self._optimize(hist2, uc2, rho2)
        d_or, d_rc = d2[:B], d2[B:]
        v_or, v_rc = v2[:B], v2[B:]
        d_or = jnp.where(keep_or, d_or, D_MAX)
        d_rc = jnp.where(keep_rc, d_rc, D_MAX)

        # strand choice for the resolved map (ref: src/query.cpp:126-134):
        # the rc entry is replaced by the or-version when the or strand
        # compares better; a filtered-out or entry carries d = DBL_MAX
        # exactly as the un-optimized reference Minfo does
        or_wins = (d_rc > d_or) | ((d_rc == d_or) & (mc_rc < mc_or))
        use_or = jnp.where(keep_rc, or_wins & keep_or, keep_or)
        use_rc = keep_rc & jnp.logical_not(use_or)
        present = use_or | use_rc

        def pick(a_or, a_rc):
            return jnp.where(use_or[..., None] if a_or.ndim == 3 else use_or,
                             a_or, a_rc)

        hist_f = pick(hist_or, hist_rc)
        d_f = jnp.where(use_or, d_or, jnp.where(use_rc, d_rc, D_MAX))
        v_f = jnp.where(use_or, v_or, v_rc)
        mc_f = pick(mc_or, mc_rc)
        uc_f = jnp.where(use_or, uc_or, uc_rc)

        # closest scan (ref: src/query.cpp:103-137): or entries first, then
        # rc entries, "<=" so later wins ties; we resolve residual ties by
        # higher slot (reference order is hash-map dependent)
        big = jnp.float64(D_MAX)
        slot_ids = jnp.arange(S, dtype=jnp.int32)
        best_d = jnp.full((B,), big)
        best_slot = jnp.full((B,), -1, jnp.int32)
        best_strand = jnp.zeros((B,), jnp.int32)
        dm_or = jnp.where(keep_or, d_or, big)
        cand_or = jnp.min(dm_or, axis=1)
        slot_or = jnp.max(jnp.where(keep_or & (dm_or == cand_or[:, None]),
                                    slot_ids[None, :], -1), axis=1)
        has_or = slot_or >= 0
        best_d = jnp.where(has_or, cand_or, best_d)
        best_slot = jnp.where(has_or, slot_or, best_slot)
        dm_rc = jnp.where(keep_rc, d_rc, big)
        cand_rc = jnp.min(dm_rc, axis=1)
        slot_rc = jnp.max(jnp.where(keep_rc & (dm_rc == cand_rc[:, None]),
                                    slot_ids[None, :], -1), axis=1)
        rc_wins = (slot_rc >= 0) & (cand_rc <= best_d)
        best_d = jnp.where(rc_wins, cand_rc, best_d)
        best_slot = jnp.where(rc_wins, slot_rc, best_slot)
        best_strand = jnp.where(rc_wins, 1, best_strand)

        # override the resolved map at the closest slot with the closest
        # version (ref: src/query.cpp:136-138)
        is_best = (slot_ids[None, :] == best_slot[:, None])
        rc_best = is_best & (best_strand[:, None] == 1)
        or_best = is_best & (best_strand[:, None] == 0)
        hist_f = jnp.where(rc_best[..., None], hist_rc, hist_f)
        hist_f = jnp.where(or_best[..., None], hist_or, hist_f)
        d_f = jnp.where(rc_best, d_rc, jnp.where(or_best, d_or, d_f))
        v_f = jnp.where(rc_best, v_rc, jnp.where(or_best, v_or, v_f))
        mc_f = jnp.where(rc_best, mc_rc, jnp.where(or_best, mc_or, mc_f))
        uc_f = jnp.where(rc_best, uc_rc, jnp.where(or_best, uc_or, uc_f))
        present = present | (is_best & (best_slot[:, None] >= 0))

        # chi-square LRT of every leaf vs the closest (ref: src/query.cpp:420-424)
        hist_c = jnp.einsum("bs,bsx->bx", is_best.astype(F), hist_f.astype(F))
        uc_c = jnp.sum(jnp.where(is_best, uc_f, 0.0), axis=1)
        rho_c = jnp.sum(jnp.where(is_best, rho, 0.0), axis=1)
        v_c = jnp.sum(jnp.where(is_best, v_f, 0.0), axis=1)
        ratio = 2.0 * (self._llh(d_f, hist_c[:, None, :], uc_c[:, None],
                                 rho_c[:, None]) - v_c[:, None])

        return (present, hist_f, d_f, v_f, mc_f, uc_f, rho,
                best_slot, best_d, hist_c, uc_c, rho_c, v_c, ratio)

    def _probe_dispatch(self, codes, lengths):
        """Overridden by ShardedQueryEngine (resolved at trace time)."""
        return self._probe_impl(codes, lengths)

    def _full_impl(self, codes, lengths, leaf_ok):
        """Fused probe + stage 2 (single dispatch)."""
        probe_out = self._probe_dispatch(codes, lengths)
        out = self._stage2_impl(*probe_out, leaf_ok)
        return tuple(out) + (probe_out[-1],)  # append onmers

    # -------------------------------------------------------------- public
    def run_leaf_stage_async(self, codes: np.ndarray, lengths: np.ndarray,
                             leaf_ok: Optional[np.ndarray] = None):
        """Dispatch the fused step; returns the device output tuple without
        blocking (for driver-level pipelining)."""
        if leaf_ok is None:
            leaf_ok = np.ones(self.S, bool)
        return self._full_jit(jnp.asarray(codes), jnp.asarray(lengths),
                              jnp.asarray(leaf_ok))

    def fetch_leaf_stage(self, dev_out, lengths: np.ndarray) -> "LeafResults":
        """One batched device_get of a run_leaf_stage_async result."""
        return self.fetch_prefetched(jax.device_get(tuple(dev_out)), lengths)

    def fetch_prefetched(self, fetched, lengths: np.ndarray) -> "LeafResults":
        """Build LeafResults from an already-device_get'ed output tuple."""
        (present, hist_f, d_f, v_f, mc_f, uc_f, rho, best_slot, best_d,
         hist_c, uc_c, rho_c, v_c, ratio) = fetched[:-1]
        onmers = fetched[-1]
        return LeafResults(
            present=present, hist=hist_f, d=d_f, v=v_f, match=mc_f, uc=uc_f,
            rho=np.asarray(rho), closest_slot=best_slot, closest_d=best_d,
            hist_closest=hist_c, uc_closest=uc_c, rho_closest=rho_c,
            v_closest=v_c, ratio=ratio, onmers=np.asarray(onmers),
            lengths=np.asarray(lengths))

    def run_leaf_stage(self, codes: np.ndarray, lengths: np.ndarray,
                       leaf_ok: Optional[np.ndarray] = None):
        """Full stage1+2. Returns a LeafResults bundle of numpy arrays.

        leaf_ok masks leaf slots absent from the placement tree (the probe
        decode skips them, ref: src/query.cpp:374-375).
        """
        return self.fetch_leaf_stage(
            self.run_leaf_stage_async(codes, lengths, leaf_ok), lengths)


@dataclass
class LeafResults:
    """Strand-resolved per-(read, leaf-slot) match state = node_to_minfo."""

    present: np.ndarray       # bool [B, S]
    hist: np.ndarray          # int32 [B, S, th+1]
    d: np.ndarray             # f64 [B, S] (D_MAX where absent)
    v: np.ndarray             # f64 [B, S]
    match: np.ndarray         # int32 [B, S]
    uc: np.ndarray            # f64 [B, S]
    rho: np.ndarray           # f64 [B, S]
    closest_slot: np.ndarray  # int32 [B] (-1 if none)
    closest_d: np.ndarray     # f64 [B]
    hist_closest: np.ndarray  # f64 [B, th+1]
    uc_closest: np.ndarray    # f64 [B]
    rho_closest: np.ndarray   # f64 [B]
    v_closest: np.ndarray     # f64 [B]
    ratio: np.ndarray         # f64 [B, S] chisq vs closest
    onmers: np.ndarray        # int32 [B]
    lengths: np.ndarray       # int32 [B]


class SeekEngine:
    """Single-target sketch search (ref: src/seek.cpp)."""

    def __init__(self, sketch: DeviceSketch, hdist_th: int = 4):
        self.sk = sketch
        self.th = int(hdist_th)
        self.lsh = sketch.lsh
        self._enc = jnp.asarray(sketch.enc_v)
        self._row_start = jnp.asarray(sketch.row_start.astype(np.int32))
        self._resident = jnp.asarray(sketch.resident)
        self._rank = jnp.asarray(sketch.res_rank.astype(np.int32))
        self._llh = make_llh(self.lsh.k, self.lsh.h, self.th)
        self._run_jit = jax.jit(self._run_impl)

    def _strand_min(self, rix, res, valid):
        th = self.th
        m = self.lsh.m
        R = self.sk.R
        nk = max(len(self.sk.enc_v), 1)
        rmod = (rix % jnp.uint32(m)).astype(jnp.int32)
        resident = self._resident[rmod] & valid
        urow = (rix // jnp.uint32(m)).astype(jnp.int32) * R + jnp.maximum(self._rank[rmod], 0)
        urow = jnp.where(resident, urow, 0)
        start = self._row_start[urow]
        cnt = jnp.where(resident, self._row_start[urow + 1] - start, 0)

        def body(j, gmin):
            idx = jnp.minimum(start + j, nk - 1)
            inb = j < cnt
            e = self._enc[idx]
            hd = codec.hdist_lr32(e, res)
            return jnp.where(inb, jnp.minimum(gmin, hd), gmin)

        gmin0 = jnp.full(valid.shape, HD_SENTINEL, jnp.int32)
        gmin = jax.lax.fori_loop(0, self.sk.max_bucket, body, gmin0)
        # SSummary records the bucket-min only when <= th
        # (ref: src/seek.cpp:103-119)
        return jnp.where(gmin <= th, gmin, HD_SENTINEL)

    def _run_impl(self, codes, lengths):
        lsh = self.lsh
        k = lsh.k
        B, L = codes.shape
        P = L - k + 1
        th = self.th
        t_idx = jnp.arange(P, dtype=jnp.int32)
        valid = codec.window_valid(codes, k) & (t_idx[None, :] <= lengths[:, None] - k)
        onmers = jnp.sum(valid, axis=1, dtype=jnp.int32)
        xs = jnp.arange(th + 1, dtype=jnp.int32)

        outs = []
        for rix, res in ((codec.lsh_hash_or(codes, lsh), codec.residual_or(codes, lsh)),
                         (codec.lsh_hash_rc(codes, lsh), codec.residual_rc(codes, lsh))):
            gmin = self._strand_min(rix, res, valid)
            onehot = (gmin[..., None] == xs[None, None, :])
            hist = jnp.sum(onehot, axis=1).astype(F)          # [B, th+1]
            matchc = jnp.sum(hist, axis=-1)
            uc = (onmers.astype(F) - matchc)
            rho = jnp.full((B,), self.sk.rho, F)

            def f(d, hist=hist, uc=uc, rho=rho):
                return self._llh(d, hist, uc, rho)

            d, v = brent_find_minima(f, (B,))
            outs.append((matchc, d))
        (mc_or, d_or), (mc_rc, d_rc) = outs
        has = (mc_or + mc_rc) > 0
        d = jnp.where(d_or < d_rc, d_or, d_rc)
        return has, d

    def run(self, codes: np.ndarray, lengths: np.ndarray):
        has, d = self._run_jit(jnp.asarray(codes), jnp.asarray(lengths))
        return jax.device_get((has, d))
