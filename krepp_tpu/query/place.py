"""`place` driver: phylogenetic placement with jplace/tabular/summarize output.

Reproduces IBatch::place_sequences / report_placement semantics
(ref: src/query.cpp:198-333) with the ancestor walk turned into a dense
damping-weight matmul over the flattened placement tree and the per-edge ML
re-optimisation batched through the Brent solver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np

from ..core.codec import pad_codes_batch
from ..core.llh import brent_on_mask, F
from ..index.index import DeviceIndex, PlacementView
from ..io.fastx import QueryBatcher
from ..reports import (begin_jplace, end_jplace, fmt5, fmt5_array,
                       jplace_fields, jukes_cantor, place_header)
from .engine import QueryEngine, LeafResults
from .dist import _bucket_len


@dataclass
class PlaceConfig:
    hdist_th: int = 4
    chisq_value: float = 2.706
    tau: int = 2
    multi: bool = True
    no_filter: bool = False
    summarize: bool = False
    tabular: bool = False
    batch_bp: int = 16384 * 150


class PlaceAggregator:
    """Stage 3: leaf minfos -> per-placement-node stats (jitted)."""

    def __init__(self, engine: QueryEngine, pv: PlacementView, cfg: PlaceConfig):
        self.engine = engine
        self.pv = pv
        self.cfg = cfg
        self.Q = pv.qflat.nnodes
        self._W = jnp.asarray(pv.weights)               # [Q+1, S]
        self._Wpos = jnp.asarray(pv.weights > 0)
        leaf_of_q = np.full(self.Q + 1, -1, np.int32)   # slot owning leaf node q
        for s, q in enumerate(pv.leaf_qse):
            if q > 0:
                leaf_of_q[q] = s
        self._leaf_of_q = jnp.asarray(leaf_of_q)
        self._is_leaf_q = jnp.asarray(leaf_of_q >= 0)
        self._rho_slot = engine._rho_slot
        self._llh = engine._llh
        self._llh_fast = engine._llh_fast
        # structural candidate gate: eff_nchildren-covered internal nodes
        # with a parent (ref: src/query.cpp:268-281)
        self._cand_struct = jnp.asarray(pv.candidate_ok
                                        & (pv.qflat.parent != 0))
        self._agg_jit = jax.jit(self._agg_impl)
        self._place_jits = {}

    def _agg_impl(self, present, hist, match, d, v, uc, onmers, lengths,
                  hist_c, uc_c, rho_c, v_c):
        """Returns per-(read, qnode): hist_q, uc_q, rho_q, d_q, v_q,
        support_q, leq_tau_q, chisq_q."""
        k = self.engine.lsh.k
        W = self._W
        p = present.astype(F)                                  # [B, S]
        histW = jnp.einsum("qs,bsx->bqx", W, hist.astype(F) * p[..., None])
        matchW = jnp.einsum("qs,bs->bq", W, match.astype(F) * p)
        support = jnp.einsum("qs,bs->bq", self._Wpos.astype(F), p) > 0
        rhoW = jnp.max(
            jnp.where(self._Wpos[None, :, :] & present[:, None, :],
                      self._rho_slot[None, None, :], 0.0), axis=2)
        enmers = (lengths - k + 1).astype(F)
        uc_int = enmers[:, None] - matchW                      # internal nodes

        # leaf nodes use their own strand-resolved minfo verbatim
        lq = jnp.maximum(self._leaf_of_q, 0)
        leaf_hist = hist[:, lq, :].astype(F)
        leaf_uc = uc[:, lq]
        leaf_d = d[:, lq]
        leaf_v = v[:, lq]
        leaf_rho = jnp.broadcast_to(self._rho_slot[lq][None, :], uc_int.shape)
        isl = self._is_leaf_q[None, :]
        hist_q = jnp.where(isl[..., None], leaf_hist, histW)
        uc_q = jnp.where(isl, leaf_uc, uc_int)
        rho_q = jnp.where(isl, leaf_rho, rhoW)

        # re-optimise internal candidates (ref: src/query.cpp:272-275);
        # only supported internal nodes need the (f64-emulated) solver
        need = support & jnp.logical_not(isl)
        xs = jnp.arange(hist_q.shape[-1], dtype=F)
        A_q = jnp.sum(hist_q, axis=-1)
        Bx_q = jnp.einsum("bqx,x->bq", hist_q, xs)
        d_opt, v_opt = brent_on_mask(self._llh_fast, A_q, Bx_q, uc_q, rho_q,
                                     need)
        d_q = jnp.where(isl, leaf_d, d_opt)
        v_q = jnp.where(isl, leaf_v, v_opt)

        tau = self.cfg.tau
        leq_tau = jnp.sum(hist_q[..., : tau + 1], axis=-1)
        chisq_q = 2.0 * (self._llh(d_q, hist_c[:, None, :], uc_c[:, None],
                                   rho_c[:, None]) - v_c[:, None])
        return hist_q, uc_q, rho_q, d_q, v_q, support, leq_tau, chisq_q

    def aggregate(self, lr: LeafResults):
        out = self._agg_jit(
            jnp.asarray(lr.present), jnp.asarray(lr.hist), jnp.asarray(lr.match),
            jnp.asarray(lr.d), jnp.asarray(lr.v), jnp.asarray(lr.uc),
            jnp.asarray(lr.onmers), jnp.asarray(lr.lengths),
            jnp.asarray(lr.hist_closest), jnp.asarray(lr.uc_closest),
            jnp.asarray(lr.rho_closest), jnp.asarray(lr.v_closest))
        return jax.device_get(tuple(out))

    def _place_impl(self, tables, packed, vbits, lengths, leaf_ok,
                    exact: bool = False):
        """Fused probe + stage 2 + placement aggregation, returning a
        device-compacted candidate list.

        The dense [B, Q] d/v grids dominated the fetched bytes (the remote
        device link is the pipeline bottleneck), so the pre-chisq candidate
        mask — support & structural gate & leq_tau & multi-read activity
        (ref: src/query.cpp:218-281) — is compacted on device to at most K
        (read, qnode) lanes; the chi-square LRT itself stays on host f64
        over just those lanes. exact=True sizes K to the full grid (the
        overflow retier), so compaction can never truncate."""
        from ..core import codec as _codec
        from ..core.compact import compact_mask_indices

        eng = self.engine
        codes = _codec.unpack_codes(packed, lengths, packed.shape[1] * 16,
                                    vbits)
        probe_out = eng._probe_dispatch(tables, codes, lengths, exact)
        lane_cap = None if exact else max(8 * codes.shape[0], 4096)
        out, lane_over = eng._stage2_impl(*probe_out[:5], leaf_ok,
                                          lane_cap=lane_cap)
        (present, hist_f, d_f, v_f, mc_f, uc_f, _rho, best_slot, best_d,
         hist_c, uc_c, rho_c, v_c, _ratio) = out
        onmers, overflow = probe_out[4], probe_out[5]
        (_hist_q, _uc_q, _rho_q, d_q, v_q, support, leq_tau, _chisq) = \
            self._agg_impl(present, hist_f, mc_f, d_f, v_f, uc_f,
                           onmers, lengths, hist_c, uc_c, rho_c, v_c)

        tau = self.cfg.tau
        n_pres = jnp.sum(present, axis=1)
        leq_tau_c = jnp.sum(hist_c[:, : tau + 1], axis=1)
        active = (n_pres > 0) & (self.cfg.no_filter | (leq_tau_c > 1.0))
        multi_r = active & (n_pres > 1)
        pre_cand = support & self._cand_struct[None, :] & multi_r[:, None]
        if not self.cfg.no_filter:
            pre_cand = pre_cand & (leq_tau > 1.0)
        flat = pre_cand.reshape(-1)
        B = present.shape[0]
        K = flat.shape[0] if exact else min(flat.shape[0],
                                            max(4096, 8 * B))
        cand_idx, n_cand = compact_mask_indices(flat, K)
        safe = jnp.minimum(cand_idx, flat.shape[0] - 1)
        cand_d = d_q.reshape(-1)[safe]
        cand_v = v_q.reshape(-1)[safe]
        overflow = overflow | lane_over | (n_cand > K)
        return (present, best_slot, best_d, hist_c, uc_c, rho_c, v_c,
                cand_idx, cand_d, cand_v, n_cand, onmers, overflow)

    def run_place_async(self, codes, lengths, leaf_ok, exact: bool = False):
        from ..core import codec as _codec

        eng = self.engine
        if exact not in self._place_jits:
            import functools

            self._place_jits[exact] = jax.jit(
                functools.partial(self._place_impl, exact=exact))
        packed, vbits = _codec.pack_codes_host(np.asarray(codes),
                                               np.asarray(lengths))
        return self._place_jits[exact](
            eng._tables, jnp.asarray(packed),
            None if vbits is None else jnp.asarray(vbits),
            jnp.asarray(lengths), jnp.asarray(leaf_ok))

    def run_place_exact(self, codes, lengths, leaf_ok):
        return self.run_place_async(codes, lengths, leaf_ok, exact=True)

    def chisq_host(self, d_q, hist_c, uc_c, rho_c, v_c) -> np.ndarray:
        """chisq_q = 2 (llh(d_q | closest) - v_closest) on host f64."""
        self._ensure_llh_np()
        return 2.0 * (self._llh_np(d_q, hist_c[:, None, :], uc_c[:, None],
                                   rho_c[:, None]) - v_c[:, None])

    def chisq_cand_host(self, cb, cd, hist_c, uc_c, rho_c, v_c) -> np.ndarray:
        """Per-candidate-lane chi-square LRT vs the closest candidate
        (ref: src/query.cpp:284-296), host f64 over compacted lanes."""
        self._ensure_llh_np()
        return 2.0 * (self._llh_np(cd, hist_c[cb], uc_c[cb], rho_c[cb])
                      - v_c[cb])

    def _ensure_llh_np(self):
        from ..core.llh import make_llh_np

        if not hasattr(self, "_llh_np"):
            eng = self.engine
            self._llh_np = make_llh_np(eng.lsh.k, eng.lsh.h, eng.th)


def run_place(dindex: DeviceIndex, query_path: str, out: TextIO,
              invocation: str, cfg: Optional[PlaceConfig] = None,
              qtree=None, engine_factory=None) -> int:
    cfg = cfg or PlaceConfig()
    pv = dindex.placement_view(qtree)
    engine = engine_factory(dindex, cfg.hdist_th) if engine_factory else \
        QueryEngine(dindex, cfg.hdist_th)
    agg = PlaceAggregator(engine, pv, cfg)
    qflat = pv.qflat
    tree_nwk = pv.qtree.newick(jplace=True, fixed5=True)
    if cfg.summarize or cfg.tabular:
        out.write(place_header(invocation, tree_nwk, cfg.summarize, cfg.tabular))
    else:
        out.write(begin_jplace())

    leaf_ok = np.asarray(pv.leaf_qse > 0)
    names_q = qflat.names
    total = 0
    has_previous = False
    wcount = np.zeros(qflat.nnodes + 1)

    from collections import deque

    pending = deque()

    def flush_one():
        nonlocal has_previous
        names_b, lengths_b, codes_b, dev = pending.popleft()
        fetched = jax.device_get(tuple(dev))
        if bool(np.any(fetched[-1])):
            # heavy-tail / candidate-capacity overflow: redo this batch with
            # the exact scan + full-grid candidate capacity
            fetched = jax.device_get(tuple(agg.run_place_exact(
                codes_b, lengths_b, leaf_ok)))
            if bool(np.any(fetched[-1])):
                raise RuntimeError("probe overflow persisted in the exact "
                                   "re-run; reduce the batch size")
        has_previous = flush_place_batch(
            agg, fetched, names_b, np.asarray(lengths_b), pv, cfg, out,
            wcount, has_previous)

    batch_bp = min(cfg.batch_bp,
                   engine.suggested_batch_reads(place=True) * 150)
    for names, seqs in QueryBatcher(query_path, bp_limit=batch_bp):
        total += len(names)
        codes, lengths = pad_codes_batch(
            seqs, pad_to=_bucket_len(max(len(s) for s in seqs)))
        dev = agg.run_place_async(codes, lengths, leaf_ok)
        pending.append((names, lengths, codes, dev))
        if len(pending) >= 3:
            flush_one()
    while pending:
        flush_one()
    if cfg.summarize:
        twcount = wcount.sum()
        for q in np.flatnonzero(wcount):
            w = wcount[q]
            nm = names_q[q] if names_q[q] else "NA"
            out.write(f"{nm}\t{q - 1}\t{fmt5(w)}\t{fmt5(w / twcount)}\n")
    elif not cfg.tabular:
        out.write(end_jplace(invocation, total, tree_nwk))
    return total


def flush_place_batch(agg: PlaceAggregator, fetched, names_b, lengths_b,
                      pv: PlacementView, cfg: PlaceConfig, out: TextIO,
                      wcount: np.ndarray, has_previous: bool) -> bool:
    """Host half of one fused place batch: unpack the device tuple,
    chi-square the compacted candidate lanes, emit the report."""
    (present, best_slot, best_d, hist_c, uc_c, rho_c, v_c,
     cand_idx, cand_d, cand_v, n_cand, onmers, _ov) = fetched
    lr = LeafResults(
        present=present, d=None, closest_slot=best_slot,
        closest_d=best_d, hist_closest=hist_c, uc_closest=uc_c,
        rho_closest=rho_c, v_closest=v_c, onmers=np.asarray(onmers),
        lengths=lengths_b)
    m = min(int(n_cand), len(cand_idx))
    Qp = agg.Q + 1
    idx = np.asarray(cand_idx[:m], np.int64)
    cb = idx // Qp
    cq = idx % Qp
    cd = np.asarray(cand_d[:m])
    cv = np.asarray(cand_v[:m])
    chisq_c = agg.chisq_cand_host(cb, cd, hist_c, uc_c, rho_c, v_c)
    return _report_batch(lr, names_b, pv, cfg, out, wcount, has_previous,
                         cb, cq, cd, cv, chisq_c)


def _jplace_row(qflat, q: int, d: float, v: float, lwr: float) -> str:
    pend = qflat.blen[q] / 2.0 if not math.isnan(qflat.blen[q]) else 0.0
    return jplace_fields(q - 1, jukes_cantor(d) - pend, pend, -v, lwr, d)


def _jplace_rows_bulk(qflat, qs: np.ndarray, d: np.ndarray, v: np.ndarray,
                      lwr: np.ndarray) -> np.ndarray:
    """Vectorized _jplace_row over candidate arrays -> object str array."""
    blen = qflat.blen[qs]
    pend = np.where(np.isnan(blen), 0.0, blen / 2.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        jc = -0.75 * np.log(1.0 - (4.0 / 3.0) * d)
    en = (qs - 1).astype(str).astype(object)
    return ("[" + en + ", " + fmt5_array(jc - pend) + ", " + fmt5_array(pend)
            + ", " + fmt5_array(-v) + ", " + fmt5_array(lwr) + ", "
            + fmt5_array(d) + "]")


def _report_batch(lr: LeafResults, names: List[str], pv: PlacementView,
                  cfg: PlaceConfig, out: TextIO, wcount: np.ndarray,
                  has_previous: bool,
                  cb, cq, cd, cv, chisq_c) -> bool:
    """Bulk-vectorized report pass (ref: src/query.cpp:218-333).

    cb/cq/cd/cv/chisq_c are the device-compacted pre-chisq candidate lanes
    in row-major (read, qnode) order (mask semantics live in
    PlaceAggregator._place_impl); this pass applies the chi-square LRT
    filter, normalises LWRs and emits rows — all batch-wide, with only the
    jplace per-read nesting walking (emitted) reads."""
    qflat = pv.qflat
    B = lr.present.shape[0]
    tau = cfg.tau
    names_a = np.asarray(names, dtype=object)

    n_pres = lr.present.sum(axis=1)
    leq_tau_c = lr.hist_closest[:, : tau + 1].sum(axis=1)
    active = (n_pres > 0) & (cfg.no_filter | (leq_tau_c > 1.0))
    single = active & (n_pres == 1)

    # single-match reads place on the closest leaf's edge with LWR 1
    sb = np.flatnonzero(single)
    s_q = pv.leaf_qse[lr.closest_slot[sb]].astype(np.int64)
    s_d = lr.closest_d[sb]
    s_v = lr.v_closest[sb]

    # chi-square LRT filter over the compacted candidates
    # (ref: src/query.cpp:284-296)
    keep = chisq_c < cfg.chisq_value
    cb, cq, cd, cv = cb[keep], cq[keep], cd[keep], cv[keep]
    lwr = np.exp(-chisq_c[keep] / 2.0)
    tot = np.bincount(cb, weights=lwr, minlength=B)
    counts = np.bincount(cb, minlength=B)
    with np.errstate(invalid="ignore", divide="ignore"):
        cw = lwr / tot[cb]

    if not cfg.multi and len(cb):
        # best by highest card, then lowest distance, then highest edge id
        # — the last element of the reference's stable (card, -d) sort
        # (ref: src/query.cpp:312-319)
        order = np.lexsort((-cq, cd, -qflat.card[cq], cb))
        _, first = np.unique(cb[order], return_index=True)
        pick = order[first]
        cb, cq, cd, cv, cw = cb[pick], cq[pick], cd[pick], cv[pick], cw[pick]
        counts = np.minimum(counts, 1)

    if cfg.summarize:
        np.add.at(wcount, s_q, 1.0)
        if cfg.multi:
            with np.errstate(divide="ignore"):
                np.add.at(wcount, cq, 1.0 / counts[cb])
        else:
            np.add.at(wcount, cq, 1.0)
        return has_previous

    if cfg.tabular:
        qn = np.asarray([x if x else "NA" for x in qflat.names], object)
        srows = (names_a[sb] + "\t" + qn[s_q] + "\t"
                 + (s_q - 1).astype(str).astype(object) + "\t1.00000\t"
                 + fmt5_array(s_d) + "\n")
        crows = (names_a[cb] + "\t" + qn[cq] + "\t"
                 + (cq - 1).astype(str).astype(object) + "\t"
                 + fmt5_array(cw) + "\t" + fmt5_array(cd) + "\n")
        order = np.argsort(np.concatenate([sb, cb]), kind="stable")
        out.write("".join(np.concatenate([srows, crows])[order].tolist()))
        return has_previous

    # jplace: vectorized row strings, per-read nesting over emitted reads
    srows = _jplace_rows_bulk(qflat, s_q, s_d, s_v, np.ones(len(sb)))
    crows = _jplace_rows_bulk(qflat, cq, cd, cv, cw)
    starts = np.searchsorted(cb, np.arange(B))
    ends = np.searchsorted(cb, np.arange(B) + 1)
    s_of = np.full(B, -1, np.int64)
    s_of[sb] = np.arange(len(sb))
    parts: List[str] = []
    for b in np.flatnonzero(active):
        if single[b]:
            body = srows[s_of[b]] + "]}"
        elif cfg.multi:
            body = (",".join("\n\t\t\t\t" + r
                             for r in crows[starts[b]: ends[b]])
                    + "]\n\t\t\t}")
        elif ends[b] > starts[b]:
            body = crows[starts[b]] + "]}"
        else:
            continue
        if has_previous:
            parts.append(",\n")
        parts.append(f'\t\t\t{{"n" : ["{names[b]}"], "p" : [' + body)
        has_previous = True
    out.write("".join(parts))
    return has_previous
