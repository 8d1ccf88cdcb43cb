"""Weak-form golden check against the reference README's documented
outputs (/root/reference/README.md:44-119) — VERDICT r04 #8.

The README excerpts were captured with krepp v0.6.0, while the mounted
reference source is v0.8.3 (src/common.hpp:50): v0.6.0 printed ~6
significant digits and a "#software ... #version" header, v0.8.3 prints
fixed 5-decimal values (src/common.hpp:48) and "# software ... version:".
Numeric byte-matching against the README would therefore match the WRONG
version; the reference binary itself is unbuildable here (empty
submodules, stripped toy tarball). What IS stable across both versions —
and what this test pins — is the documented framing: column names and
order, the jplace version/fields/placements/metadata/tree structure, the
{edge}-decorated Newick, and the per-row field shapes. The exact v0.8.3
numeric formatting is separately parity-tested against the oracle
transliteration (test_e2e_dist/test_e2e_place).
"""

import io
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

import worldgen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def toy_world(tmp_path_factory):
    d = tmp_path_factory.mktemp("readme_world")
    rng = np.random.default_rng(11)
    nwk, genomes = worldgen.make_world(rng, nleaves=6, glen=3000, rate=0.05)
    os.makedirs(d / "refs", exist_ok=True)
    with open(d / "input_map.tsv", "w") as m:
        for name, seq in genomes.items():
            p = d / "refs" / f"{name}.fna"
            with open(p, "w") as f:
                f.write(f">{name}\n{seq}\n")
            m.write(f"{name}\t{p}\n")
    (d / "tree.nwk").write_text(nwk)
    reads = worldgen.sample_reads(rng, genomes, n=8, mut=0.04,
                                  with_garbage=0)
    with open(d / "q.fq", "w") as f:
        for i, (_name, r) in enumerate(reads):
            # read ids in the README's ||<pos>-<id> style
            f.write(f"@||{61435 + i}-{i}\n{r}\n+\n{'I' * len(r)}\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=f"{REPO}:{REPO}/tests")
    subprocess.run(
        [sys.executable, "-m", "krepp_tpu", "index", "-i", "input_map.tsv",
         "-o", "idx", "-t", "tree.nwk", "-k", "27", "-h", "11", "-w", "35"],
        cwd=d, env=env, check=True, capture_output=True)
    return d, env


def _run(d, env, *args):
    out = subprocess.run([sys.executable, "-m", "krepp_tpu", *args],
                         cwd=d, env=env, check=True, capture_output=True,
                         text=True)
    return out.stdout


def test_dist_framing(toy_world):
    d, env = toy_world
    out = _run(d, env, "dist", "-q", "q.fq", "-i", "idx")
    lines = out.splitlines()
    # header framing (README.md:44-45 modulo the v0.8.3 spacing,
    # src/krepp.cpp:311-319)
    assert lines[0].startswith("# software: krepp\tversion: v0.8.3"
                               "\tinvocation :")
    assert lines[1] == "SEQ_ID\tREFERENCE_NAME\tDIST"
    # rows: read id starting ||, a genome name, a fixed-5-decimal distance
    assert len(lines) > 2
    for row in lines[2:]:
        sid, ref, dist = row.split("\t")
        assert sid.startswith("||")
        assert re.fullmatch(r"\d+\.\d{5}|nan", dist), dist


def test_jplace_framing(toy_world):
    d, env = toy_world
    out = _run(d, env, "place", "-q", "q.fq", "-i", "idx")
    doc = json.loads(out)
    # README.md:66-90 structure
    assert doc["version"] == 3
    assert doc["fields"] == ["edge_num", "pendant_length", "distal_length",
                             "likelihood", "like_weight_ratio", "distance"]
    assert set(doc["metadata"]) == {"software", "version", "repository",
                                    "num_queries", "invocation"}
    assert doc["metadata"]["software"] == "krepp"
    assert doc["metadata"]["repository"] == "https://github.com/bo1929/krepp"
    assert int(doc["metadata"]["num_queries"]) == 8
    # {edge}-decorated Newick with one label per edge incl. the root
    tree = doc["tree"]
    edges = re.findall(r"\{(\d+)\}", tree)
    assert sorted(map(int, edges)) == list(range(len(edges)))
    assert tree.endswith(";")
    for p in doc["placements"]:
        assert set(p) == {"n", "p"}
        assert len(p["n"]) == 1 and p["n"][0].startswith("||")
        for rowv in p["p"]:
            assert len(rowv) == 6
            assert isinstance(rowv[0], int)
    # raw text framing matches the reference's begin_jplace byte layout
    # (src/krepp.cpp:426-432)
    assert out.startswith('{\n\t"version" : 3,\n\t"fields" : ["edge_num"')


def test_tabular_framing(toy_world):
    d, env = toy_world
    out = _run(d, env, "place", "-q", "q.fq", "-i", "idx", "--tabular")
    lines = out.splitlines()
    assert lines[0].startswith("# software: krepp\tversion: v0.8.3")
    # decorated backbone on line 2 (README.md:115-116), then the v0.8.3
    # column set (src/krepp.cpp:404)
    assert lines[1].startswith("# ") and "{0}" in lines[1]
    assert lines[2] == "SEQ_ID\tDISTAL_NODE\tEDGE_NUM\tLWR\tDIST"
    for row in lines[3:]:
        parts = row.split("\t")
        assert len(parts) == 5
        assert re.fullmatch(r"\d+", parts[2])
        assert re.fullmatch(r"-?\d+\.\d{5}|nan", parts[3])
        assert re.fullmatch(r"-?\d+\.\d{5}|nan", parts[4])
