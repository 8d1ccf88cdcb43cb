"""Parameter-space fuzz: engine vs oracle across edge LSH configurations.

Covers k-h = 16 (residual uses bit 31), tiny hash spaces (h=3), no-frac
residue selection, and m=3 (odd modulus).
"""

import numpy as np
import pytest

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.index.build import build_index
from krepp_tpu.index.index import DeviceIndex
from krepp_tpu.query.engine import QueryEngine
from krepp_tpu.tree.newick import Tree
from krepp_tpu.reports import fmt5
from krepp_tpu.core.codec import seq_to_codes, pad_codes_batch

import oracle_query
import worldgen

from test_e2e_dist import write_world, oracle_rho


CONFIGS = [
    dict(k=31, h=15, m=2, r=1, frac=True, w=37),    # k-h = 16: residual bit 31
    dict(k=19, h=3, m=2, r=0, frac=False, w=25),    # tiny hash space, no-frac
    dict(k=23, h=8, m=3, r=1, frac=True, w=29),     # odd modulus
    dict(k=29, h=13, m=4, r=1, frac=True, w=35),    # reference defaults
]                                                   # (ref: src/krepp.hpp:47-58)


@pytest.mark.parametrize("cfgi", range(len(CONFIGS)))
def test_fuzz_config_matches_oracle(cfgi, tmp_path):
    c = CONFIGS[cfgi]
    rng = np.random.default_rng(500 + cfgi)
    nwk, genomes = worldgen.make_world(rng, nleaves=5, glen=1200, rate=0.05)
    input_map = write_world(tmp_path, genomes)
    params = IndexParams(
        lsh=LSHParams.generate(c["k"], c["h"], c["m"], seed=cfgi + 1),
        w=c["w"], r=c["r"], frac=c["frac"])
    tree = Tree.parse(nwk)
    built = build_index(input_map, params, tree, progress=False)
    di = DeviceIndex.from_built(built)
    lsh = params.lsh
    oi = oracle_query.OracleIndex(lsh.k, params.w, list(lsh.ppos),
                                  list(lsh.npos), lsh.m, params.r,
                                  params.frac, tree)
    leaf_se = {built.ftree.names[se]: se
               for se in range(1, built.ftree.nnodes + 1)
               if built.ftree.is_leaf[se]}
    for name in sorted(genomes):
        rho = oracle_rho(genomes[name], lsh.k, params.w, list(lsh.ppos),
                         list(lsh.npos), lsh.m, params.r, params.frac)
        oi.add_genome(leaf_se[name], genomes[name], rho)
    # partial-rho coefficient for arbitrary residue sets
    residues = (params.r + 1) if params.frac else 1
    for se in oi.rho:
        oi.rho[se] *= residues / lsh.m

    reads = worldgen.sample_reads(rng, genomes, n=8, mut=0.05)
    engine = QueryEngine(di, hdist_th=4)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    lr = engine.run_leaf_stage(codes, lengths)
    for b, (rid, seq) in enumerate(reads):
        want = oracle_query.dist_rows(oi, seq, hdist_th=4)
        got_slots = np.flatnonzero(lr.present[b])
        if want is None:
            assert len(got_slots) == 0, (cfgi, b, rid)
            continue
        got = sorted((int(di.leaf_ses[s]), fmt5(float(lr.d[b, s])))
                     for s in got_slots)
        assert got == sorted((se, fmt5(d)) for se, d in want), (cfgi, b, rid)
