"""End-to-end: build + dist on a synthetic world vs the pure-Python oracle.

The oracle transliterates the reference algorithm; the pipeline must produce
identical 5-decimal-formatted distances for every (read, reference) pair.
"""

import io
import os

import numpy as np
import pytest

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.core.hll import HyperLogLog
from krepp_tpu.index.build import build_index
from krepp_tpu.index.index import DeviceIndex
from krepp_tpu.query.engine import QueryEngine, D_MAX
from krepp_tpu.query.dist import run_dist, DistConfig
from krepp_tpu.tree.newick import Tree
from krepp_tpu.reports import fmt5
from krepp_tpu.core.codec import seq_to_codes, pad_codes_batch

import oracle
import oracle_query
import worldgen


def write_world(tmp_path, genomes):
    input_map = []
    for name in sorted(genomes):
        p = tmp_path / f"{name}.fna"
        with open(p, "w") as f:
            for i, contig in enumerate(genomes[name]):
                f.write(f">{name}_c{i}\n{contig}\n")
        input_map.append((name, str(p)))
    return input_map


def oracle_rho(contigs, k, w, ppos, npos, m, r, frac):
    n1 = n2 = 0.0
    for seq in contigs:
        if len(seq) < w:
            continue
        _, c1, c2 = oracle.extract_mers_oracle(seq, k, w, ppos, npos, m, r, frac)
        h1 = HyperLogLog(12)
        h1.add_many(np.array(c1, dtype=np.uint32))
        h2 = HyperLogLog(12)
        h2.add_many(np.array(c2, dtype=np.uint32))
        n1 += h1.estimate()
        n2 += h2.estimate()
    return n2 / n1 if n1 > 0 else 0.0


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(42)
    tmp_path = tmp_path_factory.mktemp("world")
    nwk, genomes = worldgen.make_world(rng, nleaves=6, glen=1600, rate=0.05)
    input_map = write_world(tmp_path, genomes)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 2, seed=3),
                         w=35, r=1, frac=True)
    tree = Tree.parse(nwk)
    built = build_index(input_map, params, tree, progress=False)
    di = DeviceIndex.from_built(built)
    # oracle index with identical rho values
    lsh = params.lsh
    oi = oracle_query.OracleIndex(lsh.k, params.w, list(lsh.ppos),
                                  list(lsh.npos), lsh.m, params.r, params.frac,
                                  tree)
    leaf_se = {built.ftree.names[se]: se
               for se in range(1, built.ftree.nnodes + 1)
               if built.ftree.is_leaf[se]}
    for name in sorted(genomes):
        rho = oracle_rho(genomes[name], lsh.k, params.w, list(lsh.ppos),
                         list(lsh.npos), lsh.m, params.r, params.frac)
        oi.add_genome(leaf_se[name], genomes[name], rho)
    oi.apply_rho_partial()
    reads = worldgen.sample_reads(rng, genomes, n=14, mut=0.06)
    return built, di, oi, reads, genomes, tree


def test_index_contents_match_oracle(world):
    built, di, oi, reads, genomes, tree = world
    # reconstruct (local_row, enc) -> leafset from the built index
    got = {}
    starts = np.concatenate([[0], built.inc[:-1]])
    for row in range(len(built.inc)):
        for i in range(starts[row], built.inc[row]):
            leaves = built.colors.leaves_of(built.se_v[i])
            got[(row, int(built.enc_v[i]))] = set(int(x) for x in leaves)
    want = {}
    for row, encs in oi.table.items():
        for enc, leaves in encs.items():
            want[(row, enc)] = set(leaves)
    assert got == want


def test_rho_matches_oracle(world):
    built, di, oi, reads, genomes, tree = world
    for se, rho in oi.rho.items():
        assert abs(di.colors.rho[se] - rho) < 1e-12


def test_dist_rows_match_oracle(world):
    built, di, oi, reads, genomes, tree = world
    engine = QueryEngine(di, hdist_th=4)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    lr = engine.run_leaf_stage(codes, lengths)
    leaf_of_slot = di.leaf_ses
    for b, (rid, seq) in enumerate(reads):
        want = oracle_query.dist_rows(oi, seq, hdist_th=4)
        got_slots = np.flatnonzero(lr.present[b])
        if want is None:
            assert len(got_slots) == 0, (b, rid)
            continue
        got = [(int(leaf_of_slot[s]), float(lr.d[b, s])) for s in got_slots]
        want_f = [(se, fmt5(d)) for se, d in want]
        got_f = [(se, fmt5(d)) for se, d in got]
        assert got_f == want_f, (b, rid, got, want)


def test_dist_filter_and_closest_match_oracle(world):
    built, di, oi, reads, genomes, tree = world
    engine = QueryEngine(di, hdist_th=4)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    lr = engine.run_leaf_stage(codes, lengths)
    leaf_of_slot = di.leaf_ses
    for b, (rid, seq) in enumerate(reads):
        want = oracle_query.dist_rows(oi, seq, hdist_th=4, no_filter=False)
        if want is None:
            assert lr.closest_slot[b] == -1 or not lr.present[b].any()
            continue
        got = []
        for s in np.flatnonzero(lr.present[b]):
            if lr.ratio[b, s] < 2.706:
                got.append((int(leaf_of_slot[s]), fmt5(float(lr.d[b, s]))))
        assert got == [(se, fmt5(d)) for se, d in want], (b, rid)
        # closest agrees
        wm = oracle_query.query_read(oi, seq, 4)
        if wm[1] is not None:
            assert int(leaf_of_slot[lr.closest_slot[b]]) == wm[1], (b, rid)
            assert fmt5(float(lr.closest_d[b])) == fmt5(wm[2].d)


def test_run_dist_output_golden(world, tmp_path):
    built, di, oi, reads, genomes, tree = world
    qpath = tmp_path / "q.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    n = run_dist(di, str(qpath), out, "krepp-tpu dist test", DistConfig())
    assert n == len(reads)
    text = out.getvalue()
    lines = text.splitlines()
    assert lines[1] == "SEQ_ID\tREFERENCE_NAME\tDIST"
    # spot-check against oracle-formatted rows
    name_of = {se: built.ftree.names[se] for se in range(built.ftree.nnodes + 1)}
    expect_rows = []
    for rid, seq in reads:
        want = oracle_query.dist_rows(oi, seq, hdist_th=4)
        if want is None:
            expect_rows.append(f"{rid}\tNA\tNaN")
        else:
            for se, d in want:
                expect_rows.append(f"{rid}\t{name_of[se]}\t{fmt5(d)}")
    assert lines[2:] == expect_rows


def test_dist_modes_match_oracle(world, tmp_path):
    """--no-multi, --filter, --dist-max and --summarize vs the oracle."""
    built, di, oi, reads, genomes, tree = world
    name_of = {se: built.ftree.names[se] for se in range(built.ftree.nnodes + 1)}
    qpath = tmp_path / "qm.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")

    def run(cfg):
        out = io.StringIO()
        run_dist(di, str(qpath), out, "inv", cfg)
        return out.getvalue().splitlines()[2:]

    # --no-multi: single closest row per read
    got = run(DistConfig(multi=False))
    expect = []
    for rid, seq in reads:
        want = oracle_query.dist_rows(oi, seq, multi=False)
        if want is None:
            expect.append(f"{rid}\tNA\tNaN")
        else:
            se, d = want[0]
            expect.append(f"{rid}\t{name_of[se]}\t{fmt5(d)}")
    assert got == expect

    # --filter (chisq)
    got = run(DistConfig(no_filter=False))
    expect = []
    for rid, seq in reads:
        want = oracle_query.dist_rows(oi, seq, no_filter=False)
        if want is None:
            expect.append(f"{rid}\tNA\tNaN")
        else:
            for se, d in want:
                expect.append(f"{rid}\t{name_of[se]}\t{fmt5(d)}")
    assert got == expect

    # --dist-max
    got = run(DistConfig(dist_max=0.05))
    expect = []
    for rid, seq in reads:
        want = oracle_query.dist_rows(oi, seq, dist_max=0.05)
        if want is None:
            expect.append(f"{rid}\tNA\tNaN")
        else:
            for se, d in want:
                expect.append(f"{rid}\t{name_of[se]}\t{fmt5(d)}")
    assert got == expect


def test_dist_summarize_matches_oracle(world, tmp_path):
    built, di, oi, reads, genomes, tree = world
    name_of = {se: built.ftree.names[se] for se in range(built.ftree.nnodes + 1)}
    qpath = tmp_path / "qs.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    run_dist(di, str(qpath), out, "inv", DistConfig(summarize=True))
    lines = out.getvalue().splitlines()
    assert lines[1] == "REFERENCE_NAME\tWEIGHTED_COUNT\tSEQUENCE_ABUNDANCE"
    # oracle summarize (ref: src/query.cpp:160-171): chisq filter applies
    wc = {}
    for rid, seq in reads:
        nm, cse, cl, onm = oracle_query.query_read(oi, seq, 4)
        import math as _m
        sel = [se for se in sorted(nm)
               if cl.ratio_at(nm[se].d, oi.k, oi.h, 4) < 2.706]
        for se in sel:
            wc[se] = wc.get(se, 0.0) + 1.0 / len(sel)
    tw = sum(wc.values())
    expect = [f"{name_of[se]}\t{fmt5(wc[se])}\t{fmt5(wc[se] / tw)}"
              for se in sorted(wc)]
    assert lines[2:] == expect
