"""Sketch/seek end-to-end + artifact format roundtrips."""

import io
import math

import numpy as np
import pytest

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.index.build import build_index, build_sketch
from krepp_tpu.index.index import DeviceIndex, DeviceSketch
from krepp_tpu.index import artifact
from krepp_tpu.query.engine import SeekEngine
from krepp_tpu.query.seek import run_seek
from krepp_tpu.query.dist import run_dist, DistConfig
from krepp_tpu.tree.newick import Tree
from krepp_tpu.reports import fmt5
from krepp_tpu.core.codec import seq_to_codes, pad_codes_batch

import oracle
import oracle_query
import worldgen

from test_e2e_dist import write_world, oracle_rho


@pytest.fixture(scope="module")
def sketch_world(tmp_path_factory):
    rng = np.random.default_rng(5)
    tmp = tmp_path_factory.mktemp("sk")
    glen = 2200
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    gpath = tmp / "target.fna"
    with open(gpath, "w") as f:
        f.write(f">target\n{genome}\n")
    params = IndexParams(lsh=LSHParams.generate(26, 10, 2, seed=4),
                         w=32, r=1, frac=True)
    built = build_sketch(str(gpath), params, progress=False)
    reads = worldgen.sample_reads(rng, {"target": [genome]}, n=10, mut=0.05)
    return built, params, genome, reads, tmp


def oracle_seek(built, params, genome, seq, hdist_th=4):
    """SSummary/SBatch semantics (ref: src/seek.cpp)."""
    lsh = params.lsh
    k, h = lsh.k, lsh.h
    # oracle sketch: row -> set(enc)
    table = {}
    kept, _, _ = oracle.extract_mers_oracle(
        genome, k, params.w, list(lsh.ppos), list(lsh.npos), lsh.m,
        params.r, params.frac)
    for row, enc in kept:
        table.setdefault(row, set()).add(enc)
    rho = oracle_rho([genome], k, params.w, list(lsh.ppos), list(lsh.npos),
                     lsh.m, params.r, params.frac)
    rho *= (params.r + 1) / lsh.m if params.frac else 1 / lsh.m
    mers = oracle.search_mers_oracle(seq, k, list(lsh.ppos), list(lsh.npos))
    onmers = len(mers)
    results = []
    for si in range(2):
        hist = [0.0] * (hdist_th + 1)
        match = 0.0
        for mer in mers:
            pos, rix, res = mer[3 * si: 3 * si + 3][0], mer[1 + 3 * si], mer[2 + 3 * si]
            rr = rix % lsh.m
            if not (rr <= params.r if params.frac else rr == params.r):
                continue
            local = rix // lsh.m * (params.r + 1) + rr if params.frac else rix // lsh.m
            hmin = hdist_th + 1
            for enc in table.get(local, ()):  # min over bucket
                hd = oracle.hdist_lr32(enc, res)
                if hd < hmin:
                    hmin = hd
            if hmin <= hdist_th:
                match += 1
                hist[hmin] += 1
        uc = onmers - match
        f = lambda d: oracle.llh_oracle(d, hist, uc, rho, k, h, hdist_th)
        d, v = oracle.brent_oracle(f, 1e-10, 0.5)
        results.append((match, d))
    (m_or, d_or), (m_rc, d_rc) = results
    if m_or + m_rc == 0:
        return None
    return d_or if d_or < d_rc else d_rc


def test_seek_matches_oracle(sketch_world):
    built, params, genome, reads, tmp = sketch_world
    ds = DeviceSketch.from_built(built)
    engine = SeekEngine(ds, 4)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    has, d = engine.run(codes, lengths)
    for b, (rid, seq) in enumerate(reads):
        want = oracle_seek(built, params, genome, seq)
        if want is None:
            assert not has[b], (b, rid)
        else:
            assert has[b], (b, rid)
            assert fmt5(float(d[b])) == fmt5(want), (b, rid, d[b], want)


def test_sketch_reference_roundtrip(sketch_world, tmp_path):
    built, params, genome, reads, tmp = sketch_world
    path = str(tmp_path / "sketch.bin")
    artifact.save_sketch_reference(built, path)
    ds = artifact.load_sketch_reference(path)
    ds0 = DeviceSketch.from_built(built)
    assert np.array_equal(ds.enc_v, ds0.enc_v)
    assert np.array_equal(ds.row_start, ds0.row_start)
    assert abs(ds.rho - ds0.rho) < 1e-15
    assert ds.lsh == ds0.lsh


def test_run_seek_output(sketch_world, tmp_path):
    built, params, genome, reads, tmp = sketch_world
    ds = DeviceSketch.from_built(built)
    qpath = tmp_path / "q.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    n = run_seek(ds, str(qpath), out, "inv")
    assert n == len(reads)
    lines = out.getvalue().splitlines()
    assert lines[1] == "SEQ_ID\tDIST"
    assert len(lines) == 2 + len(reads)


@pytest.fixture(scope="module")
def index_world(tmp_path_factory):
    rng = np.random.default_rng(101)
    tmp = tmp_path_factory.mktemp("ia")
    nwk, genomes = worldgen.make_world(rng, nleaves=6, glen=1400, rate=0.05)
    input_map = write_world(tmp, genomes)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 4, seed=2),
                         w=35, r=1, frac=True)
    tree = Tree.parse(nwk)
    built = build_index(input_map, params, tree, progress=False)
    reads = worldgen.sample_reads(rng, genomes, n=8, mut=0.05)
    return built, reads, tmp


def _dist_text(di, reads, tmp_path, tag):
    qpath = tmp_path / f"q_{tag}.fq"
    with open(qpath, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = io.StringIO()
    run_dist(di, str(qpath), out, "inv", DistConfig())
    return out.getvalue()


def test_native_artifact_roundtrip(index_world, tmp_path):
    built, reads, tmp = index_world
    d = str(tmp_path / "native_idx")
    artifact.save_native(built, d)
    di0 = DeviceIndex.from_built(built)
    di1 = artifact.load_native_device(d)
    assert np.array_equal(di0.enc_v, di1.enc_v)
    assert np.array_equal(di0.se_v, di1.se_v)
    assert np.array_equal(di0.row_start, di1.row_start)
    assert np.allclose(di0.colors.rho, di1.colors.rho)
    assert _dist_text(di0, reads, tmp_path, "a") == _dist_text(di1, reads, tmp_path, "b")


def test_reference_artifact_roundtrip(index_world, tmp_path):
    built, reads, tmp = index_world
    d = str(tmp_path / "ref_idx")
    artifact.save_index_reference(built, d)
    di0 = DeviceIndex.from_built(built)
    di1 = artifact.load_index_reference(d)
    # colors decode to identical leafsets even though pse ids may differ
    assert di0.nkmers == di1.nkmers
    assert np.array_equal(di0.row_start, di1.row_start)
    s0 = {(int(r), int(e)): frozenset(
        int(x) for x in di0.colors.leaves_of(int(di0.se_v[i])))
        for i, (r, e) in enumerate(zip(
            np.repeat(np.arange(di0.nrows_u), np.diff(di0.row_start)),
            di0.enc_v))}
    s1 = {(int(r), int(e)): frozenset(
        int(x) for x in di1.colors.leaves_of(int(di1.se_v[i])))
        for i, (r, e) in enumerate(zip(
            np.repeat(np.arange(di1.nrows_u), np.diff(di1.row_start)),
            di1.enc_v))}
    assert s0 == s1
    assert _dist_text(di0, reads, tmp_path, "c") == _dist_text(di1, reads, tmp_path, "d")


def test_multi_partial_reference_load(index_world, tmp_path):
    """Two no-frac partials (r=1, r=2) built separately and loaded from one
    directory must behave like the reference's partial-index workflow
    (ref: src/krepp.cpp:66-108, src/index.cpp:144-158)."""
    import dataclasses

    from krepp_tpu.index.build import build_index
    from krepp_tpu.tree.newick import Tree

    built, reads, tmp = index_world
    # rebuild the same world twice with different residues
    input_map = [(n, str(tmp / f"{n}.fna")) for n in built.names]
    refdir = tmp_path / "multipart"
    parts = []
    for r in (1, 2):
        p = dataclasses.replace(built.params, r=r, frac=False)
        b = build_index(input_map, p, built.tree, progress=False)
        artifact.save_index_reference(b, str(refdir))
        parts.append(b)
    di = artifact.load_index_reference(str(refdir))
    assert int(di.resident.sum()) == 2
    assert di.nkmers == parts[0].nkmers + parts[1].nkmers
    # rho coefficient = 2/4 residues
    for b in parts:
        pass
    # query through both partials: every read that hits residues 1 or 2 must
    # produce finite distances
    out_text = _dist_text(di, reads, tmp_path, "mp")
    assert "DIST" in out_text
    rows = [l for l in out_text.splitlines()[2:] if not l.endswith("NaN")]
    assert len(rows) > 0


def test_native_multi_partial_equals_frac(index_world, tmp_path):
    """r=0 and r=1 no-frac native partials combined at load must answer
    queries identically to the one-shot frac build
    (ref workflow: src/krepp.cpp:66-108)."""
    import dataclasses

    built, reads, tmp = index_world  # frac r=1 m=4 -> residues {0, 1}
    input_map = [(n, str(tmp / f"{n}.fna")) for n in built.names]
    nd = tmp_path / "native_mp"
    for r in (0, 1):
        p = dataclasses.replace(built.params, r=r, frac=False)
        b = build_index(input_map, p, built.tree, progress=False)
        artifact.save_native(b, str(nd), partial=True)
    di = artifact.load_native_device(str(nd))
    di0 = DeviceIndex.from_built(built)
    assert int(di.resident.sum()) == 2
    assert di.nkmers == di0.nkmers
    assert np.array_equal(di.enc_v, di0.enc_v)
    assert np.allclose(di.rho_slot, di0.rho_slot)
    assert _dist_text(di, reads, tmp_path, "mp_n") == \
        _dist_text(di0, reads, tmp_path, "mp_f")


def test_partial_lsh_mismatch_rejected(index_world, tmp_path):
    """Mixed-seed partials must be refused (ref: src/lshf.cpp:159-180)."""
    import dataclasses

    built, reads, tmp = index_world
    input_map = [(n, str(tmp / f"{n}.fna")) for n in built.names]
    d = tmp_path / "bad_mp"
    p0 = dataclasses.replace(built.params, r=0, frac=False)
    b0 = build_index(input_map, p0, built.tree, progress=False)
    artifact.save_native(b0, str(d), partial=True)
    other = IndexParams(lsh=LSHParams.generate(27, 11, 4, seed=99),
                        w=35, r=1, frac=False)
    b1 = build_index(input_map, other, built.tree, progress=False)
    artifact.save_native(b1, str(d), partial=True)
    with pytest.raises(ValueError, match="incompatible hash functions"):
        artifact.load_native_device(str(d))
