"""`dist` driver: per-read ML distances to every matching reference.

Host orchestration of the device engine, reproducing the report semantics
of IBatch::report_distances (ref: src/query.cpp:158-196) and the
QueryIndex::estimate_distances pipeline (ref: src/krepp.cpp:347-394).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, TextIO

import numpy as np

from ..core.codec import pad_codes_batch
from ..index.index import DeviceIndex
from ..io.fastx import QueryBatcher
from ..reports import dist_header, fmt5
from .engine import QueryEngine


def _bucket_len(n: int) -> int:
    """Pad batch max length to limit jit recompiles.

    Short reads snap to 64-multiples; long queries (contigs) to powers of
    two so each decade of lengths costs at most a few compiles.
    """
    if n <= 512:
        return max(64, ((n + 63) // 64) * 64)
    return 1 << (n - 1).bit_length()


@dataclass
class DistConfig:
    hdist_th: int = 4
    chisq_value: float = 2.706
    dist_max: float = math.nan
    multi: bool = True
    no_filter: bool = True
    summarize: bool = False
    # device batch granularity (output-neutral; the reference's 76.8 kbp
    # batches are too small to feed a TPU, ref: src/rqseq.hpp:10-11)
    batch_bp: int = 16384 * 150


def run_dist(dindex: DeviceIndex, query_path: str, out: TextIO,
             invocation: str, cfg: Optional[DistConfig] = None,
             engine_factory=None) -> int:
    cfg = cfg or DistConfig()
    engine = engine_factory(dindex, cfg.hdist_th) if engine_factory else \
        QueryEngine(dindex, cfg.hdist_th)
    out.write(dist_header(invocation, cfg.summarize))
    leaf_names = [dindex.ftree.names[se] for se in dindex.leaf_ses]
    total = 0
    wcount: Dict[int, float] = {}
    twcount = 0.0

    from collections import deque

    pending = deque()

    # the chi-square ratio is only consulted by summarize / --filter modes;
    # it is recomputed host-side from the closest-candidate summary
    need_ratio = cfg.summarize or not cfg.no_filter

    out_mode = "dist_ratio" if need_ratio else "dist"

    def flush_one():
        names_b, lengths_b, codes_b, dev = pending.popleft()
        lr = engine.fetch_leaf_stage(dev, lengths_b, codes=codes_b,
                                     out_mode=out_mode)
        if need_ratio:
            lr.ratio = engine.compute_ratio_host(lr)
        _report_batch(lr, names_b, leaf_names, cfg, out, wcount)

    for names, seqs in QueryBatcher(query_path, bp_limit=cfg.batch_bp):
        total += len(names)
        codes, lengths = pad_codes_batch(
            seqs, pad_to=_bucket_len(max(len(s) for s in seqs)))
        dev = engine.run_leaf_stage_async(codes, lengths, out_mode=out_mode)
        pending.append((names, lengths, codes, dev))
        if len(pending) >= 3:
            flush_one()
    while pending:
        flush_one()
    if cfg.summarize:
        twcount = sum(wcount.values())
        for slot in sorted(wcount):
            w = wcount[slot]
            out.write(f"{leaf_names[slot]}\t{fmt5(w)}\t{fmt5(w / twcount)}\n")
    return total


def _report_batch(lr, names: List[str], leaf_names: List[str],
                  cfg: DistConfig, out: TextIO, wcount: Dict[int, float]):
    B, S = lr.present.shape
    dist_max = cfg.dist_max
    no_dmax = math.isnan(dist_max)
    for b in range(B):
        slots = np.flatnonzero(lr.present[b])
        if cfg.summarize:
            # (ref: src/query.cpp:160-171): chisq filter always applies
            sel = [s for s in slots
                   if lr.ratio[b, s] < cfg.chisq_value
                   and (no_dmax or lr.d[b, s] < dist_max)]
            for s in sel:
                wcount[s] = wcount.get(s, 0.0) + 1.0 / len(sel)
            continue
        if len(slots) == 0 or (not no_dmax and lr.closest_d[b] > dist_max):
            out.write(f"{names[b]}\tNA\tNaN\n")
            continue
        if cfg.multi:
            for s in slots:
                if not cfg.no_filter and not (lr.ratio[b, s] < cfg.chisq_value):
                    continue
                if no_dmax or lr.d[b, s] < dist_max:
                    out.write(f"{names[b]}\t{leaf_names[s]}\t{fmt5(lr.d[b, s])}\n")
        else:
            s = int(lr.closest_slot[b])
            out.write(f"{names[b]}\t{leaf_names[s]}\t{fmt5(lr.closest_d[b])}\n")
