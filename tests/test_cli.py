"""CLI smoke tests: full subcommand flows in-process."""

import json
import os

import numpy as np
import pytest

from krepp_tpu.cli import main

import worldgen
from test_e2e_dist import write_world


@pytest.fixture(scope="module")
def cli_world(tmp_path_factory):
    rng = np.random.default_rng(8)
    tmp = tmp_path_factory.mktemp("cli")
    nwk, genomes = worldgen.make_world(rng, nleaves=6, glen=1500, rate=0.05)
    input_map = write_world(tmp, genomes)
    with open(tmp / "input_map.tsv", "w") as f:
        for name, path in input_map:
            f.write(f"{name}\t{path}\n")
    with open(tmp / "tree.nwk", "w") as f:
        f.write(nwk + "\n")
    reads = worldgen.sample_reads(rng, genomes, n=8, mut=0.05)
    with open(tmp / "q.fq", "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    return tmp, genomes


def test_cli_index_dist_place(cli_world):
    tmp, genomes = cli_world
    idx = str(tmp / "idx")
    assert main(["index", "-i", str(tmp / "input_map.tsv"), "-o", idx,
                 "-t", str(tmp / "tree.nwk"), "-k", "27", "-h", "11",
                 "-w", "35", "-m", "2", "--export-reference-format"]) == 0
    assert os.path.exists(os.path.join(idx, "meta.json"))
    assert os.path.exists(os.path.join(idx, "cmer-m2r1-frac"))

    dout = str(tmp / "dist.tsv")
    assert main(["dist", "-q", str(tmp / "q.fq"), "-i", idx, "-o", dout]) == 0
    lines = open(dout).read().splitlines()
    assert lines[1] == "SEQ_ID\tREFERENCE_NAME\tDIST"
    assert len(lines) > 2

    pout = str(tmp / "place.jplace")
    assert main(["place", "-q", str(tmp / "q.fq"), "-i", idx, "-o", pout]) == 0
    doc = json.loads(open(pout).read())
    assert doc["version"] == 3

    tout = str(tmp / "place.tsv")
    assert main(["place", "-q", str(tmp / "q.fq"), "-i", idx, "-o", tout,
                 "--tabular"]) == 0
    assert "SEQ_ID\tDISTAL_NODE" in open(tout).read()

    sout = str(tmp / "dist_sum.tsv")
    assert main(["dist", "-q", str(tmp / "q.fq"), "-i", idx, "-o", sout,
                 "--summarize"]) == 0
    assert "REFERENCE_NAME\tWEIGHTED_COUNT" in open(sout).read()


def test_cli_reference_format_reload(cli_world, capsys):
    """dist against the exported reference-format files only."""
    tmp, genomes = cli_world
    idx = str(tmp / "idx")
    refdir = str(tmp / "refidx")
    os.makedirs(refdir, exist_ok=True)
    for fn in os.listdir(idx):
        if "-m2r1-frac" in fn:
            os.link(os.path.join(idx, fn), os.path.join(refdir, fn))
    dout = str(tmp / "dist_ref.tsv")
    assert main(["dist", "-q", str(tmp / "q.fq"), "-i", refdir, "-o", dout]) == 0
    a = open(str(tmp / "dist.tsv")).read().splitlines()[2:]
    b = open(dout).read().splitlines()[2:]
    assert a == b


def test_cli_sketch_seek(cli_world):
    tmp, genomes = cli_world
    name = sorted(genomes)[0]
    sk = str(tmp / "sk.bin")
    assert main(["sketch", "-i", str(tmp / f"{name}.fna"), "-o", sk,
                 "-k", "26", "-h", "10", "-m", "2"]) == 0
    sout = str(tmp / "seek.tsv")
    assert main(["seek", "-q", str(tmp / "q.fq"), "-i", sk, "-o", sout]) == 0
    lines = open(sout).read().splitlines()
    assert lines[1] == "SEQ_ID\tDIST"
    assert len(lines) == 2 + 10


def test_cli_inspect(cli_world, capsys):
    tmp, genomes = cli_world
    idx = str(tmp / "idx")
    assert main(["inspect", "-i", idx]) == 0
    out = capsys.readouterr().out
    assert "NUM_COLORS" in out
    assert "MER_COUNT" in out


def test_cli_place_lineage(cli_world, tmp_path):
    tmp, genomes = cli_world
    idx = str(tmp / "idx")
    names = sorted(genomes)
    lpath = tmp_path / "lineages.txt"
    with open(lpath, "w") as f:
        for i, n in enumerate(names):
            fam = "f__A" if i < len(names) // 2 else "f__B"
            f.write(f"{n}\tk__Bacteria; p__P; c__C; o__O; {fam}; g__G{i}; s__\n")
    pout = str(tmp_path / "place_lin.tsv")
    assert main(["place", "-q", str(tmp / "q.fq"), "-i", idx, "-o", pout,
                 "-l", str(lpath), "--tabular"]) == 0
    text = open(pout).read()
    assert "SEQ_ID\tDISTAL_NODE" in text
