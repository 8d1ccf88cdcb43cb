"""FASTA/FASTQ streaming reader and query batcher.

kseq-equivalent semantics (ref: src/kseq.h): record name is the text up to
the first whitespace; FASTA sequences may span multiple lines; gzip handled
transparently. The query batcher mirrors QSeq::read_next_batch
(ref: src/rqseq.cpp:180-197): a batch closes once cumulative bases reach
RBATCH_SIZE * DSEQ_LEN = 76,800.
"""

from __future__ import annotations

import gzip
import io
import os
import re
import tempfile
from typing import Iterator, List, Tuple

import numpy as np

from ..params import BATCH_BP_LIMIT
from ..core.codec import seq_to_codes


# URL inputs (ref: src/rqseq.hpp:13-56 downloads via libcurl); here we use
# urllib and surface a clear error in offline environments.
_URL_RE = re.compile(r"^(?:https?|ftp)://\S+$")


def is_url(path: str) -> bool:
    return bool(_URL_RE.match(path))


def resolve_input(path: str) -> str:
    """Download URL inputs to a temp file; local paths pass through."""
    if not is_url(path):
        return path
    import urllib.request

    suffix = ".gz" if path.endswith(".gz") else ""
    tmp = tempfile.NamedTemporaryFile(prefix="seq_", suffix=suffix,
                                      delete=False)
    try:
        with urllib.request.urlopen(path, timeout=60) as r:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                tmp.write(chunk)
        tmp.close()
        return tmp.name
    except Exception as e:  # noqa: BLE001
        tmp.close()
        os.unlink(tmp.name)
        raise RuntimeError(
            f"Failed to download {path}: {e} (offline environment?)") from e


def _open_text(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.GzipFile(fileobj=f), encoding="ascii",
                                errors="replace")
    return io.TextIOWrapper(f, encoding="ascii", errors="replace")


def _rec_name(header_rest: str) -> str:
    parts = header_rest.split()
    return parts[0] if parts else ""


def read_fastx(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (name, sequence) records from FASTA or FASTQ (optionally .gz)."""
    path = resolve_input(path)
    with _open_text(path) as f:
        line = f.readline()
        while line and not line.strip():
            line = f.readline()
        if not line:
            return
        if line.startswith(">"):
            name = _rec_name(line[1:])
            parts: List[str] = []
            for line in f:
                if line.startswith(">"):
                    yield name, "".join(parts)
                    name = _rec_name(line[1:])
                    parts = []
                else:
                    parts.append(line.strip())
            yield name, "".join(parts)
        elif line.startswith("@"):
            # kseq semantics (ref: src/kseq.h:116-170): the sequence spans
            # every line up to the '+' separator; quality lines accumulate
            # until their total length reaches the sequence length, so
            # wrapped (multi-line) FASTQ parses exactly like kseq
            while True:
                name = _rec_name(line[1:])
                parts = []
                while True:
                    line = f.readline()
                    if not line or line.startswith("+"):
                        break
                    parts.append(line.strip())
                seq = "".join(parts)
                qlen = 0
                while qlen < len(seq):
                    qline = f.readline()
                    if not qline:
                        break
                    qlen += len(qline.strip())
                yield name, seq
                line = f.readline()
                while line and not line.strip():
                    line = f.readline()
                if not line:
                    return
        else:
            raise ValueError(f"Unrecognised FASTA/FASTQ format in {path}")


def read_genome_codes(path: str) -> Iterator[np.ndarray]:
    """Yield per-contig base-code arrays (native C reader when available)."""
    from . import native

    path = resolve_input(path)
    if native.native_available():
        for _name, codes in native.read_fastx_native(path):
            yield codes
        return
    for _name, seq in read_fastx(path):
        yield seq_to_codes(seq)


class QueryBatcher:
    """Batches query reads by cumulative bp (ref: src/rqseq.cpp:180-197).

    Yields (names, per-read base-code arrays); uses the native C reader
    when available.
    """

    def __init__(self, path: str, bp_limit: int = BATCH_BP_LIMIT):
        self.path = path
        self.bp_limit = bp_limit

    def _records(self) -> Iterator[Tuple[str, np.ndarray]]:
        from . import native

        path = resolve_input(self.path)
        if native.native_available():
            yield from native.read_fastx_native(path)
            return
        for name, seq in read_fastx(path):
            yield name, seq_to_codes(seq)

    def __iter__(self) -> Iterator[Tuple[List[str], List[np.ndarray]]]:
        names: List[str] = []
        seqs: List[np.ndarray] = []
        bpc = 0
        for name, codes in self._records():
            names.append(name)
            seqs.append(codes)
            bpc += len(codes)
            if bpc >= self.bp_limit:
                yield names, seqs
                names, seqs, bpc = [], [], 0
        if names:
            yield names, seqs
