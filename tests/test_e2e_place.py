"""End-to-end: place on the synthetic world vs the pure-Python oracle."""

import io
import math

import numpy as np
import pytest

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.index.build import build_index
from krepp_tpu.index.index import DeviceIndex
from krepp_tpu.query.engine import QueryEngine
from krepp_tpu.query.place import run_place, PlaceConfig, PlaceAggregator
from krepp_tpu.query.dist import run_dist, DistConfig
from krepp_tpu.tree.newick import Tree
from krepp_tpu.reports import fmt5
from krepp_tpu.core.codec import seq_to_codes, pad_codes_batch

import oracle_query
import worldgen

from test_e2e_dist import write_world, oracle_rho


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(77)
    tmp_path = tmp_path_factory.mktemp("worldp")
    nwk, genomes = worldgen.make_world(rng, nleaves=8, glen=1500, rate=0.06)
    input_map = write_world(tmp_path, genomes)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 2, seed=9),
                         w=35, r=1, frac=True)
    tree = Tree.parse(nwk)
    built = build_index(input_map, params, tree, progress=False)
    di = DeviceIndex.from_built(built)
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
    reads = worldgen.sample_reads(rng, genomes, n=12, mut=0.04)
    return built, di, oi, reads, tree


def engine_place(di, cfg, reads):
    engine = QueryEngine(di, cfg.hdist_th)
    pv = di.placement_view(None)
    agg = PlaceAggregator(engine, pv, cfg)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    lr = engine.run_leaf_stage(codes, lengths)
    return lr, pv, agg.aggregate(lr)


@pytest.mark.parametrize("multi", [True, False])
def test_place_candidates_match_oracle(world, multi):
    built, di, oi, reads, tree = world
    cfg = PlaceConfig(multi=multi)
    lr, pv, (hist_q, uc_q, rho_q, d_q, v_q, support, leq_tau, chisq_q) = \
        engine_place(di, cfg, reads)
    qflat = pv.qflat
    qtree_nodes = {se: tree.se_to_node[se] for se in range(1, tree.nnodes + 1)}
    for b, (rid, seq) in enumerate(reads):
        want = oracle_query.place_read(oi, seq, qtree_nodes,
                                       hdist_th=cfg.hdist_th,
                                       chisq_value=cfg.chisq_value,
                                       tau=cfg.tau, no_filter=cfg.no_filter,
                                       multi=multi)
        # reproduce the driver's selection logic
        n_pres = int(lr.present[b].sum())
        closest_leq = float(lr.hist_closest[b, : cfg.tau + 1].sum())
        if n_pres == 0 or not (cfg.no_filter or closest_leq > 1.0):
            assert want is None, (b, rid)
            continue
        assert want is not None, (b, rid)
        if n_pres == 1:
            s = int(lr.closest_slot[b])
            got = [(int(pv.leaf_qse[s]), 1.0, float(lr.closest_d[b]),
                    float(lr.v_closest[b]))]
        else:
            cand_mask = (support[b] & pv.candidate_ok & (qflat.parent != 0))
            cand_mask &= cfg.no_filter | (leq_tau[b] > 1.0)
            cand_mask &= chisq_q[b] < cfg.chisq_value
            cand = np.flatnonzero(cand_mask)
            lwr = np.exp(-chisq_q[b, cand] / 2.0)
            tot = lwr.sum()
            rows = [(int(q), float(lwr[i] / tot), float(d_q[b, q]),
                     float(v_q[b, q])) for i, q in enumerate(cand)]
            if multi:
                got = rows
            else:
                order = sorted(range(len(cand)),
                               key=lambda i: (qflat.card[cand[i]],
                                              -d_q[b, cand[i]]))
                got = [rows[order[-1]]]
        wf = [(q, fmt5(l), fmt5(d)) for q, l, d, v in want]
        gf = [(q, fmt5(l), fmt5(d)) for q, l, d, v in got]
        assert sorted(gf) == sorted(wf), (b, rid, got, want)
        # v (likelihood) agreement too
        wv = {q: fmt5(-v) for q, l, d, v in want}
        gv = {q: fmt5(-v) for q, l, d, v in got}
        assert gv == wv, (b, rid)


@pytest.mark.parametrize("force_lanes", [False, True])
def test_run_place_rows_match_oracle(world, tmp_path, monkeypatch,
                                     force_lanes):
    """Driver-level parity: BOTH fused stage-3 formulations (dense einsum
    aggregation for small trees, ancestor-event lane expansion forced via
    KREPP_PLACE_LANES) emit the same jplace rows as the per-read oracle
    (ref: src/query.cpp:218-333)."""
    import json

    if force_lanes:
        monkeypatch.setenv("KREPP_PLACE_LANES", "1")
    built, di, oi, reads, tree = world
    cfg = PlaceConfig(multi=True)
    qpath = tmp_path / "qp.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    run_place(di, str(qpath), out, "inv", cfg)
    doc = json.loads(out.getvalue())
    got_by_read = {e["n"][0]: e["p"] for e in doc["placements"]}
    qtree_nodes = {se: tree.se_to_node[se] for se in range(1, tree.nnodes + 1)}
    n_checked = 0
    for rid, seq in reads:
        want = oracle_query.place_read(oi, seq, qtree_nodes,
                                       hdist_th=cfg.hdist_th,
                                       chisq_value=cfg.chisq_value,
                                       tau=cfg.tau, no_filter=cfg.no_filter,
                                       multi=True)
        if want is None or not want:
            assert rid not in got_by_read or not got_by_read[rid], rid
            continue
        rows = got_by_read[rid]
        got = sorted((int(r[0]), fmt5(r[4]), fmt5(r[5]), fmt5(-r[3]))
                     for r in rows)
        exp = sorted((q - 1, fmt5(l), fmt5(d), fmt5(v))
                     for q, l, d, v in want)
        assert got == exp, rid
        n_checked += 1
    assert n_checked >= 3


def test_run_place_jplace_well_formed(world, tmp_path):
    import json

    built, di, oi, reads, tree = world
    qpath = tmp_path / "q.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    n = run_place(di, str(qpath), out, "krepp-tpu place test", PlaceConfig())
    text = out.getvalue()
    doc = json.loads(text)
    assert doc["version"] == 3
    assert doc["fields"][0] == "edge_num"
    assert len(doc["placements"]) >= 1
    for entry in doc["placements"]:
        for row in entry["p"]:
            assert len(row) == 6
    assert doc["metadata"]["num_queries"] == str(len(reads))
    assert doc["tree"].endswith(";")


def test_run_place_tabular(world, tmp_path):
    built, di, oi, reads, tree = world
    qpath = tmp_path / "q.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    run_place(di, str(qpath), out, "inv", PlaceConfig(tabular=True))
    lines = out.getvalue().splitlines()
    assert lines[2] == "SEQ_ID\tDISTAL_NODE\tEDGE_NUM\tLWR\tDIST"
    assert len(lines) > 3
    for ln in lines[3:]:
        parts = ln.split("\t")
        assert len(parts) == 5


def test_place_qtree_mapping_matches_oracle(world, tmp_path):
    """Placement onto a user tree (-t): map_to_qtree + eff_nchildren path."""
    from krepp_tpu.tree.newick import Tree, map_to_qtree

    built, di, oi, reads, tree = world
    # a placement tree missing two leaves exercises unmapped slots and
    # eff_nchildren recomputation
    names = [built.ftree.names[se] for se in di.leaf_ses]
    drop = set(names[:2])
    def prune(nd):
        if nd.is_leaf:
            return None if nd.name in drop else nd.name + (
                "" if np.isnan(nd.blen) else f":{nd.blen:g}")
        subs = [prune(c) for c in nd.children]
        subs = [s for s in subs if s]
        if len(subs) == 0:
            return None
        if len(subs) == 1:
            return subs[0]
        return "(" + ",".join(subs) + ")" + (nd.name or "") + (
            "" if np.isnan(nd.blen) else f":{nd.blen:g}")
    root_s = prune(tree.root)
    if root_s.startswith("(") and not root_s.endswith(")"):
        # strip a trailing :blen on the root only
        root_s = root_s[: root_s.rindex(")") + 1]
    qnwk = root_s + ";"
    qtree = Tree.parse(qnwk)

    cfg = PlaceConfig()
    engine = QueryEngine(di, cfg.hdist_th)
    pv = di.placement_view(qtree)
    agg = PlaceAggregator(engine, pv, cfg)
    from krepp_tpu.core.codec import pad_codes_batch, seq_to_codes
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    leaf_ok = np.asarray(pv.leaf_qse > 0)
    lr = engine.run_leaf_stage(codes, lengths, leaf_ok=leaf_ok)
    hist_q, uc_q, rho_q, d_q, v_q, support, leq_tau, chisq_q = agg.aggregate(lr)

    # oracle mapping: index se -> qtree node
    se_to_node = map_to_qtree(tree, qtree)
    qtree_nodes = {se: se_to_node[se] for se in range(1, tree.nnodes + 1)
                   if se_to_node[se] is not None}
    # oracle index must also skip unmapped leaves in decode: emulate by
    # filtering minfos to mapped leaves inside place_read via qtree_nodes
    for b, (rid, seq) in enumerate(reads):
        nm, cse, cl, onm = oracle_query.query_read_mapped(
            oi, seq, cfg.hdist_th, qtree_nodes)
        gate = bool(nm) and (cfg.no_filter or cl.leq_tau(cfg.tau) > 1.0)
        n_pres = int(lr.present[b].sum())
        closest_leq = float(lr.hist_closest[b, : cfg.tau + 1].sum())
        ggate = n_pres > 0 and (cfg.no_filter or closest_leq > 1.0)
        assert gate == ggate, (b, rid)
        if not gate:
            continue
        want = oracle_query.place_read_mapped(
            oi, seq, qtree_nodes, hdist_th=cfg.hdist_th,
            chisq_value=cfg.chisq_value, tau=cfg.tau,
            no_filter=cfg.no_filter, multi=True)
        qflat = pv.qflat
        if n_pres == 1:
            s = int(lr.closest_slot[b])
            got = [(int(pv.leaf_qse[s]), 1.0, float(lr.closest_d[b]))]
        else:
            cand_mask = (support[b] & pv.candidate_ok & (qflat.parent != 0))
            cand_mask &= cfg.no_filter | (leq_tau[b] > 1.0)
            cand_mask &= chisq_q[b] < cfg.chisq_value
            cand = np.flatnonzero(cand_mask)
            lwr = np.exp(-chisq_q[b, cand] / 2.0)
            tot = lwr.sum()
            got = [(int(q), float(lwr[i] / tot), float(d_q[b, q]))
                   for i, q in enumerate(cand)]
        wf = sorted((q, fmt5(l), fmt5(d)) for q, l, d, v in want)
        gf = sorted((q, fmt5(l), fmt5(d)) for q, l, d in got)
        assert gf == wf, (b, rid, got, want)


def test_place_summarize_matches_oracle(world, tmp_path):
    built, di, oi, reads, tree = world
    qpath = tmp_path / "qsum.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    cfg = PlaceConfig(summarize=True)
    run_place(di, str(qpath), out, "inv", cfg)
    lines = out.getvalue().splitlines()
    hdr = lines.index("DISTAL_NODE\tEDGE_NUM\tWEIGHTED_COUNT\tSEQUENCE_ABUNDANCE")
    got = lines[hdr + 1:]
    # oracle accumulation (ref: src/query.cpp:231-299 summarize branches)
    qtree_nodes = {se: tree.se_to_node[se] for se in range(1, tree.nnodes + 1)}
    wc = {}
    for rid, seq in reads:
        want = oracle_query.place_read(oi, seq, qtree_nodes,
                                       no_filter=cfg.no_filter,
                                       tau=cfg.tau, multi=True)
        if want is None:
            continue
        for q, l, d, v in want:
            wc[q] = wc.get(q, 0.0) + 1.0 / len(want)
    tw = sum(wc.values())
    expect = []
    for q in sorted(wc):
        nd = tree.se_to_node[q]
        nm = nd.name if nd.name else "NA"
        expect.append(f"{nm}\t{q - 1}\t{fmt5(wc[q])}\t{fmt5(wc[q] / tw)}")
    assert got == expect


def test_place_mixed_read_lengths(world, tmp_path):
    """Variable-length reads (padding masks) against the oracle."""
    import worldgen as wg

    built, di, oi, reads, tree = world
    rng = np.random.default_rng(123)
    # re-cut reads to different lengths from the same genomes
    import oracle_query as oq
    gen_names = sorted({rid for rid, _ in reads})
    long_reads = []
    g0 = oi  # use sequences from the world fixture reads as material
    base = "".join(seq for _, seq in reads[:4])
    for i, ln in enumerate((60, 100, 151, 250, 380)):
        start = rng.integers(0, max(1, len(base) - ln))
        long_reads.append((f"mix{i}", base[start: start + ln]))
    engine = QueryEngine(di, 4)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in long_reads])
    lr = engine.run_leaf_stage(codes, lengths)
    for b, (rid, seq) in enumerate(long_reads):
        want = oracle_query.dist_rows(oi, seq, hdist_th=4)
        got_slots = np.flatnonzero(lr.present[b])
        if want is None:
            assert len(got_slots) == 0, (b, rid)
            continue
        got = sorted((int(di.leaf_ses[s]), fmt5(float(lr.d[b, s])))
                     for s in got_slots)
        assert got == sorted((se, fmt5(d)) for se, d in want), (b, rid)
