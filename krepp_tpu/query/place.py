"""`place` driver: phylogenetic placement with jplace/tabular/summarize output.

Reproduces IBatch::place_sequences / report_placement semantics
(ref: src/query.cpp:198-333) with the ancestor walk turned into a dense
damping-weight matmul over the flattened placement tree and the per-edge ML
re-optimisation batched through the Brent solver.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np

from ..core.codec import pad_codes_batch
from ..core.llh import brent_on_mask, F
from ..index.index import DeviceIndex, PlacementView
from ..io.fastx import QueryBatcher
from ..reports import (begin_jplace, end_jplace, fmt5, jplace_fields,
                       jukes_cantor, place_header)
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
        """Fused probe + stage 2 + placement aggregation, returning only
        what the report pass consumes (the chi-square grid is recomputed on
        the host from the closest-candidate summary; the device link is the
        bottleneck, not the f64 math)."""
        from ..core import codec as _codec

        eng = self.engine
        codes = _codec.unpack_codes(packed, lengths, packed.shape[1] * 16,
                                    vbits)
        probe_out = eng._probe_dispatch(tables, codes, lengths, exact)
        out = eng._stage2_impl(*probe_out[:5], leaf_ok)
        (present, hist_f, d_f, v_f, mc_f, uc_f, _rho, best_slot, best_d,
         hist_c, uc_c, rho_c, v_c, _ratio) = out
        onmers, overflow = probe_out[4], probe_out[5]
        (_hist_q, _uc_q, _rho_q, d_q, v_q, support, leq_tau, _chisq) = \
            self._agg_impl(present, hist_f, mc_f, d_f, v_f, uc_f,
                           onmers, lengths, hist_c, uc_c, rho_c, v_c)
        return (present, best_slot, best_d, hist_c, uc_c, rho_c, v_c,
                d_q, v_q, support, leq_tau > 1.0, onmers, overflow)

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
        from ..core.llh import make_llh_np

        if not hasattr(self, "_llh_np"):
            eng = self.engine
            self._llh_np = make_llh_np(eng.lsh.k, eng.lsh.h, eng.th)
        return 2.0 * (self._llh_np(d_q, hist_c[:, None, :], uc_c[:, None],
                                   rho_c[:, None]) - v_c[:, None])


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
    wcount: Dict[int, float] = {}

    from collections import deque

    pending = deque()

    def flush_one():
        nonlocal has_previous
        names_b, lengths_b, codes_b, dev = pending.popleft()
        fetched = jax.device_get(tuple(dev))
        if bool(np.any(fetched[-1])):
            # heavy-tail overflow: redo this batch with the exact scan
            fetched = jax.device_get(tuple(agg.run_place_exact(
                codes_b, lengths_b, leaf_ok)))
        (present, best_slot, best_d, hist_c, uc_c, rho_c, v_c,
         d_q, v_q, support, leq_gt1, onmers, _ov) = fetched
        lr = LeafResults(
            present=present, d=None, closest_slot=best_slot,
            closest_d=best_d, hist_closest=hist_c, uc_closest=uc_c,
            rho_closest=rho_c, v_closest=v_c, onmers=np.asarray(onmers),
            lengths=np.asarray(lengths_b))
        chisq_q = agg.chisq_host(d_q, hist_c, uc_c, rho_c, v_c)
        has_previous = _report_batch(
            lr, names_b, pv, cfg, out, wcount, has_previous,
            d_q, v_q, support, leq_gt1, chisq_q)

    for names, seqs in QueryBatcher(query_path, bp_limit=cfg.batch_bp):
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
        twcount = sum(wcount.values())
        for q in sorted(wcount):
            w = wcount[q]
            nm = names_q[q] if names_q[q] else "NA"
            out.write(f"{nm}\t{q - 1}\t{fmt5(w)}\t{fmt5(w / twcount)}\n")
    elif not cfg.tabular:
        out.write(end_jplace(invocation, total, tree_nwk))
    return total


def _jplace_row(qflat, q: int, d: float, v: float, lwr: float) -> str:
    pend = qflat.blen[q] / 2.0 if not math.isnan(qflat.blen[q]) else 0.0
    return jplace_fields(q - 1, jukes_cantor(d) - pend, pend, -v, lwr, d)


def _report_batch(lr: LeafResults, names: List[str], pv: PlacementView,
                  cfg: PlaceConfig, out: TextIO, wcount: Dict[int, float],
                  has_previous: bool,
                  d_q, v_q, support, leq_gt1, chisq_q) -> bool:
    """(ref: src/query.cpp:218-333)."""
    qflat = pv.qflat
    B = lr.present.shape[0]
    tau = cfg.tau
    for b in range(B):
        n_pres = int(lr.present[b].sum())
        closest_leq_tau = float(lr.hist_closest[b, : tau + 1].sum())
        if n_pres == 0 or not (cfg.no_filter or closest_leq_tau > 1.0):
            continue
        if n_pres == 1:
            s = int(lr.closest_slot[b])
            q = int(pv.leaf_qse[s])
            d = float(lr.closest_d[b])
            v = float(lr.v_closest[b])
            if cfg.summarize:
                wcount[q] = wcount.get(q, 0.0) + 1.0
            elif cfg.tabular:
                nm = qflat.names[q] if qflat.names[q] else "NA"
                out.write(f"{names[b]}\t{nm}\t{q - 1}\t{fmt5(1.0)}\t{fmt5(d)}\n")
            else:
                if has_previous:
                    out.write(",\n")
                out.write(f'\t\t\t{{"n" : ["{names[b]}"], "p" : [')
                out.write(_jplace_row(qflat, q, d, v, 1.0) + "]}")
                has_previous = True
            continue

        # candidate collection (ref: src/query.cpp:268-281)
        cand_mask = (support[b] & pv.candidate_ok
                     & (qflat.parent != 0))
        cand_mask &= cfg.no_filter | leq_gt1[b]
        cand_mask &= chisq_q[b] < cfg.chisq_value
        cand = np.flatnonzero(cand_mask)
        lwr = np.exp(-chisq_q[b, cand] / 2.0)
        total_lwr = float(lwr.sum())

        if cfg.multi:
            if cfg.summarize:
                for q in cand:
                    wcount[int(q)] = wcount.get(int(q), 0.0) + 1.0 / len(cand)
            elif cfg.tabular:
                for i, q in enumerate(cand):
                    nm = qflat.names[q] if qflat.names[q] else "NA"
                    out.write(f"{names[b]}\t{nm}\t{q - 1}\t"
                              f"{fmt5(lwr[i] / total_lwr)}\t{fmt5(d_q[b, q])}\n")
            else:
                if has_previous:
                    out.write(",\n")
                out.write(f'\t\t\t{{"n" : ["{names[b]}"], "p" : [')
                rows = [
                    "\n\t\t\t\t" + _jplace_row(qflat, int(q), float(d_q[b, q]),
                                               float(v_q[b, q]),
                                               float(lwr[i] / total_lwr))
                    for i, q in enumerate(cand)]
                out.write(",".join(rows))
                out.write("]\n\t\t\t}")
                has_previous = True
        else:
            # best by highest card, then lowest distance (ref: src/query.cpp:312-319)
            order = sorted(range(len(cand)),
                           key=lambda i: (qflat.card[cand[i]], -d_q[b, cand[i]]))
            i = order[-1]
            q = int(cand[i])
            w = float(lwr[i] / total_lwr)
            if cfg.summarize:
                wcount[q] = wcount.get(q, 0.0) + 1.0
            elif cfg.tabular:
                nm = qflat.names[q] if qflat.names[q] else "NA"
                out.write(f"{names[b]}\t{nm}\t{q - 1}\t{fmt5(w)}\t{fmt5(d_q[b, q])}\n")
            else:
                if has_previous:
                    out.write(",\n")
                out.write(f'\t\t\t{{"n" : ["{names[b]}"], "p" : [')
                out.write(_jplace_row(qflat, q, float(d_q[b, q]),
                                      float(v_q[b, q]), w) + "]}")
                has_previous = True
    return has_previous
