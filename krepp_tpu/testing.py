"""Synthetic-data helpers: generated phylogenies of mutated genomes,
in-memory index builds, read samplers. Used by tests, __graft_entry__ and
bench.py (no filesystem or network required)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .params import IndexParams, LSHParams
from .core.codec import seq_to_codes
from .index.build import BuiltIndex, build_index_from_sources
from .index.index import DeviceIndex
from .tree.newick import Tree

BASES = "ACGT"


def mutate(rng, seq: str, rate: float) -> str:
    out = list(seq)
    n_mut = rng.binomial(len(seq), rate)
    for pos in rng.choice(len(seq), size=n_mut, replace=False):
        out[pos] = BASES[(BASES.index(out[pos]) + rng.integers(1, 4)) % 4]
    return "".join(out)


def make_world(rng, nleaves=6, glen=2000, rate=0.04) -> Tuple[str, Dict[str, List[str]]]:
    """Binary-ish tree of genomes derived from one ancestor.

    Returns (newick string, {name: [contig strings]}).
    """
    root = "".join(rng.choice(list(BASES), size=glen))

    def split(names, seq, depth):
        if len(names) == 1:
            return f"{names[0]}:{0.05 + 0.01 * depth:.4f}", {names[0]: [seq]}
        half = len(names) // 2
        left_seq = mutate(rng, seq, rate)
        right_seq = mutate(rng, seq, rate)
        lnwk, lgen = split(names[:half], left_seq, depth + 1)
        rnwk, rgen = split(names[half:], right_seq, depth + 1)
        lgen.update(rgen)
        return f"({lnwk},{rnwk}):{0.02 + 0.005 * depth:.4f}", lgen

    names = [f"G{i:03d}" for i in range(nleaves)]
    nwk, genomes = split(names, root, 0)
    nwk = nwk.rsplit(":", 1)[0] + ";"
    return nwk, genomes


def sample_reads(rng, genomes, n=20, rlen=150, mut=0.05, with_n=2,
                 with_garbage=2):
    """Reads drawn from random genomes + mutations; some with Ns; some
    unrelated garbage."""
    names = sorted(genomes)
    reads = []
    for i in range(n):
        g = names[rng.integers(len(names))]
        seq = genomes[g][0]
        start = rng.integers(0, len(seq) - rlen)
        r = mutate(rng, seq[start: start + rlen], mut)
        if i < with_n:
            r = list(r)
            for pos in rng.choice(rlen, size=3, replace=False):
                r[pos] = "N"
            r = "".join(r)
        reads.append((f"read{i}", r))
    for j in range(with_garbage):
        reads.append((f"garbage{j}",
                      "".join(rng.choice(list(BASES), size=rlen))))
    return reads


def build_world_index(seed=0, nleaves=6, glen=2000, rate=0.05,
                      k=27, h=11, w=35, m=4, r=1, frac=True) -> Tuple[BuiltIndex, Dict[str, List[str]], Tree]:
    """Generate a world and build its index fully in memory."""
    rng = np.random.default_rng(seed)
    nwk, genomes = make_world(rng, nleaves=nleaves, glen=glen, rate=rate)
    tree = Tree.parse(nwk)
    params = IndexParams(lsh=LSHParams.generate(k, h, m, seed=seed),
                         w=w, r=r, frac=frac)
    names = sorted(genomes)
    sources = {n: (lambda n=n: (seq_to_codes(c) for c in genomes[n]))
               for n in names}
    built = build_index_from_sources(names, sources, params, tree,
                                     progress=False)
    return built, genomes, tree
