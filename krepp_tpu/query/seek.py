"""`seek` driver: query reads against a single-genome sketch.

(ref: src/krepp.cpp:321-345, src/seek.cpp).
"""

from __future__ import annotations

from typing import TextIO

from ..core.codec import pad_codes_batch
from ..index.index import DeviceSketch
from ..io.fastx import QueryBatcher
from ..reports import fmt5, seek_header
from .engine import SeekEngine
from .dist import _bucket_len


def run_seek(sketch: DeviceSketch, query_path: str, out: TextIO,
             invocation: str, hdist_th: int = 4) -> int:
    engine = SeekEngine(sketch, hdist_th)
    out.write(seek_header(invocation))
    total = 0
    for names, seqs in QueryBatcher(query_path):
        total += len(names)
        codes, lengths = pad_codes_batch(
            seqs, pad_to=_bucket_len(max(len(s) for s in seqs)))
        has, d = engine.run(codes, lengths)
        for i, name in enumerate(names):
            if has[i]:
                out.write(f"{name}\t{fmt5(float(d[i]))}\n")
            else:
                out.write(f"{name}\tNaN\n")
    return total
