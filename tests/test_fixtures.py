"""Tests over the reference repo's own fixture files + multi-line FASTQ.

The reference test/ directory ships realistic inputs (25-leaf Newick with
named internal nodes, 100x150bp FASTQ reads, GTDB-style lineages); these
exercise the parser/reader paths on real-world shapes. Multi-line FASTQ
follows kseq semantics (ref: src/kseq.h:116-170).
"""

import gzip
import os

import numpy as np
import pytest

REF_TEST = "/root/reference/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TEST), reason="reference fixtures not mounted")


def test_tree_toy_parse_roundtrip():
    from krepp_tpu.tree.newick import Tree

    with open(os.path.join(REF_TEST, "tree_toy.nwk")) as f:
        nwk = f.read()
    tree = Tree.parse(nwk)
    leaves = [n for n in tree.postorder() if not n.children]
    assert len(leaves) == 25
    names = {n.name for n in leaves}
    assert "G000016665" in names and "G001917855" in names
    # internal node names from the file survive
    internal = {n.name for n in tree.postorder() if n.children}
    assert "N1779" in internal
    # emitted newick re-parses to the same topology/leafset
    tree2 = Tree.parse(tree.newick())
    assert {n.name for n in tree2.postorder() if not n.children} == names


def test_query_toy_fastq_readers_agree():
    from krepp_tpu.io import native
    from krepp_tpu.io.fastx import read_fastx, seq_to_codes

    path = os.path.join(REF_TEST, "query_toy.fq")
    py = [(n, s) for n, s in read_fastx(path)]
    assert len(py) == 100
    assert all(len(s) == 150 for _n, s in py)
    assert py[0][0] == "||61435-4122"
    if native.native_available():
        nat = list(native.read_fastx_native(path))
        assert len(nat) == 100
        for (pn, ps), (nn, nc) in zip(py, nat):
            assert pn == nn
            assert np.array_equal(seq_to_codes(ps), nc)


def _rewrap_fastq(src: str, dst: str, width: int, gz: bool = False):
    from krepp_tpu.io.fastx import read_fastx

    recs = list(read_fastx(src))
    opener = gzip.open if gz else open
    with opener(dst, "wt") as f:
        for name, seq in recs:
            f.write(f"@{name} extra comment\n")
            for i in range(0, len(seq), width):
                f.write(seq[i: i + width] + "\n")
            f.write("+\n")
            qual = "I" * len(seq)
            for i in range(0, len(qual), width):
                f.write(qual[i: i + width] + "\n")
    return recs


@pytest.mark.parametrize("gz", [False, True])
def test_multiline_fastq_kseq_semantics(tmp_path, gz):
    from krepp_tpu.io import native
    from krepp_tpu.io.fastx import read_fastx, seq_to_codes

    src = os.path.join(REF_TEST, "query_toy.fq")
    dst = str(tmp_path / ("wrapped.fq.gz" if gz else "wrapped.fq"))
    recs = _rewrap_fastq(src, dst, width=61, gz=gz)
    back = list(read_fastx(dst))
    assert back == recs
    if native.native_available():
        nat = list(native.read_fastx_native(dst))
        assert [n for n, _ in nat] == [n for n, _ in recs]
        for (_, s), (_, c) in zip(recs, nat):
            assert np.array_equal(seq_to_codes(s), c)


def test_lineages_toy_taxonomy_tree():
    from krepp_tpu.tree.newick import Tree

    with open(os.path.join(REF_TEST, "lineages_toy.txt")) as f:
        text = f.read()
    qtree = Tree.parse_lineages(text)
    leaves = [n for n in qtree.postorder() if not n.children]
    assert {n.name for n in leaves} >= {"G000016665", "G000018865"}
    # taxonomy internal nodes carry taxon names
    internal = {n.name for n in qtree.postorder() if n.children}
    assert any("Chloroflex" in (x or "") for x in internal)


def test_place_against_lineages_fixture(tmp_path):
    """End-to-end place onto the fixture taxonomy via a synthetic index
    whose leaf names are fixture accessions (the fixture genomes are
    stripped blobs, so the world supplies sequences)."""
    from krepp_tpu.tree.newick import Tree
    from krepp_tpu.testing import build_world_index
    import io as sio

    with open(os.path.join(REF_TEST, "lineages_toy.txt")) as f:
        lineage_text = f.read()
    accs = [ln.split("\t")[0] for ln in lineage_text.splitlines() if ln]
    built, genomes, _tree = build_world_index(
        seed=5, nleaves=len(accs), glen=3000, k=27, h=11)
    # rename the world's leaves to fixture accessions
    mapping = dict(zip(sorted(genomes), accs))
    built.names = [mapping[n] for n in built.names]
    for node in built.tree.postorder():
        if not node.children and node.name in mapping:
            node.name = mapping[node.name]
    built.ftree.names = [mapping.get(n, n) for n in built.ftree.names]

    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.place import run_place, PlaceConfig
    from krepp_tpu.testing import sample_read_codes

    rng = np.random.default_rng(0)
    codes = sample_read_codes(rng, genomes, 8, rlen=150, mut=0.02)
    qpath = str(tmp_path / "q.fq")
    with open(qpath, "w") as f:
        for i, c in enumerate(codes):
            seq = "".join("ACGTN"[b] for b in c)
            f.write(f"@read{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    qtree = Tree.parse_lineages(lineage_text)
    di = DeviceIndex.from_built(built)
    out = sio.StringIO()
    n = run_place(di, qpath, out, "test", PlaceConfig(), qtree=qtree)
    assert n == 8
    assert out.getvalue().startswith("{")
