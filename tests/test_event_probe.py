"""Event probe: forced parity vs the mask probe, and a many-genome world
(past the bitmask gate) end-to-end against the oracle transliteration."""

import io

import numpy as np
import pytest

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.index.build import build_index
from krepp_tpu.index.index import DeviceIndex, MASK_W_CAP
from krepp_tpu.query.engine import QueryEngine
from krepp_tpu.tree.newick import Tree
from krepp_tpu.reports import fmt5
from krepp_tpu.core.codec import seq_to_codes, pad_codes_batch

import oracle_query
import worldgen

from test_e2e_dist import write_world, oracle_rho


def test_event_probe_matches_mask(tmp_path, monkeypatch):
    """Forced event mode == mask mode on a small (bitmasked) world."""
    rng = np.random.default_rng(77)
    nwk, genomes = worldgen.make_world(rng, nleaves=7, glen=1600, rate=0.05)
    input_map = write_world(tmp_path, genomes)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 4, seed=7),
                         w=35, r=1, frac=True)
    built = build_index(input_map, params, Tree.parse(nwk), progress=False)
    di = DeviceIndex.from_built(built)
    assert di.se_mask is not None
    reads = worldgen.sample_reads(rng, genomes, n=10, mut=0.06)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])

    e0 = QueryEngine(di, 4)
    assert e0.mode == "hybrid"
    lr0 = e0.run_leaf_stage(codes, lengths)

    monkeypatch.setenv("KREPP_EVENT_PROBE", "1")
    e1 = QueryEngine(di, 4)
    assert e1.mode == "event"
    lr1 = e1.run_leaf_stage(codes, lengths)

    assert np.array_equal(lr0.present, lr1.present)
    assert np.array_equal(lr0.hist, lr1.hist)
    assert np.array_equal(lr0.closest_slot, lr1.closest_slot)
    assert np.array_equal(lr0.onmers, lr1.onmers)
    assert np.allclose(lr0.d[lr0.present], lr1.d[lr1.present],
                       rtol=1e-12, atol=0)


def test_event_tier_escalation(tmp_path, monkeypatch):
    """Tiny caps force overflow; the re-run tiers recover exact results."""
    import krepp_tpu.query.engine as eng_mod

    rng = np.random.default_rng(78)
    nwk, genomes = worldgen.make_world(rng, nleaves=6, glen=1500, rate=0.05)
    input_map = write_world(tmp_path, genomes)
    params = IndexParams(lsh=LSHParams.generate(23, 7, 2, seed=3),
                         w=29, r=1, frac=True)
    built = build_index(input_map, params, Tree.parse(nwk), progress=False)
    di = DeviceIndex.from_built(built)
    reads = worldgen.sample_reads(rng, genomes, n=8, mut=0.05)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])

    e0 = QueryEngine(di, 4)
    lr0 = e0.run_leaf_stage(codes, lengths)

    monkeypatch.setenv("KREPP_EVENT_PROBE", "1")
    e1 = QueryEngine(di, 4)

    caps_seen = []
    orig = QueryEngine._event_caps

    def tiny_caps(self, B, P, tier):
        E, KH, CAP_L = orig(self, B, P, tier)
        caps_seen.append(tier)
        if tier == 0:
            return E, KH, 64  # absurdly small leaf-event capacity
        return E, KH, CAP_L

    monkeypatch.setattr(QueryEngine, "_event_caps", tiny_caps)
    lr1 = e1.run_leaf_stage(codes, lengths)
    assert max(caps_seen) >= 1, "tier escalation did not trigger"
    assert np.array_equal(lr0.present, lr1.present)
    assert np.array_equal(lr0.hist, lr1.hist)
    assert np.allclose(lr0.d[lr0.present], lr1.d[lr1.present], rtol=1e-12)


@pytest.fixture(scope="module")
def big_world():
    """~3x past the bitmask gate: event mode is the only path."""
    nleaves = (MASK_W_CAP * 32) * 3 // 2  # 384 leaves
    rng = np.random.default_rng(90)
    nwk, genomes = worldgen.make_world(rng, nleaves=nleaves, glen=420,
                                       rate=0.03)
    params = IndexParams(lsh=LSHParams.generate(21, 9, 2, seed=9),
                         w=27, r=1, frac=True)
    tree = Tree.parse(nwk)
    names = sorted(genomes)
    from krepp_tpu.index.build import build_index_from_sources
    from krepp_tpu.core.codec import seq_to_codes as s2c

    sources = {n: (lambda n=n: iter([s2c(genomes[n][0])])) for n in names}
    built = build_index_from_sources(names, sources, params, tree,
                                     progress=False)
    di = DeviceIndex.from_built(built)
    return di, built, genomes, tree, params


def test_many_genome_world(big_world):
    di, built, genomes, tree, params = big_world
    assert di.se_mask is None, "big worlds must skip the bitmask table"
    rng = np.random.default_rng(91)
    reads = worldgen.sample_reads(rng, genomes, n=6, rlen=120, mut=0.04)
    engine = QueryEngine(di, hdist_th=4)
    assert engine.mode == "event"
    # place batches still scale down with the genome count (dense stage-3
    # state); lane-form dist batches are lane-bounded and only capped
    assert engine.suggested_batch_reads(place=True) < (1 << 30) // (128 * 300)
    assert engine.suggested_batch_reads() <= 32768
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    lr = engine.run_leaf_stage(codes, lengths)

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
    residues = (params.r + 1) if params.frac else 1
    for se in oi.rho:
        oi.rho[se] *= residues / lsh.m

    for b, (rid, seq) in enumerate(reads):
        want = oracle_query.dist_rows(oi, seq, hdist_th=4)
        got_slots = np.flatnonzero(lr.present[b])
        if want is None:
            assert len(got_slots) == 0, (b, rid)
            continue
        got = sorted((int(di.leaf_ses[s]), fmt5(float(lr.d[b, s])))
                     for s in got_slots)
        assert got == sorted((se, fmt5(d)) for se, d in want), (b, rid)


def test_many_genome_dist_driver(big_world, tmp_path):
    """run_dist end-to-end (adaptive batch + compact fetch) at 384 genomes."""
    from krepp_tpu.query.dist import run_dist, DistConfig

    di, built, genomes, tree, params = big_world
    rng = np.random.default_rng(92)
    reads = worldgen.sample_reads(rng, genomes, n=5, rlen=120, mut=0.04)
    qpath = tmp_path / "q.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    n = run_dist(di, str(qpath), out, "test", DistConfig(hdist_th=4))
    assert n == len(reads)
    rows = [l for l in out.getvalue().splitlines()[2:] if l]
    assert len(rows) >= 1
    for row in rows:
        parts = row.split("\t")
        assert len(parts) == 3


def test_many_genome_place_driver(big_world, tmp_path):
    """run_place end-to-end at 384 genomes (event probe + dense stage-3
    aggregation with the adaptive place batch)."""
    import json

    from krepp_tpu.query.place import run_place, PlaceConfig

    di, built, genomes, tree, params = big_world
    rng = np.random.default_rng(93)
    reads = worldgen.sample_reads(rng, genomes, n=4, rlen=120, mut=0.03)
    qpath = tmp_path / "q.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    n = run_place(di, str(qpath), out, "test", PlaceConfig(no_filter=True))
    assert n == len(reads)
    doc = json.loads(out.getvalue())
    assert doc["version"] == 3
    assert len(doc["placements"]) >= 1
