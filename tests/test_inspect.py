"""`inspect` display parity (ref: src/index.cpp:172-186,
src/krepp.cpp:187-204, src/record.cpp:255-276)."""

import io
import os

import numpy as np

from krepp_tpu.index import artifact
from krepp_tpu.inspect import display_info
from krepp_tpu.testing import build_world_index


def _build(tmp_path, **kw):
    built, genomes, tree = build_world_index(
        seed=4, nleaves=6, glen=3000, k=27, h=11, **kw)
    ref_dir = str(tmp_path / "ref_idx")
    os.makedirs(ref_dir, exist_ok=True)
    artifact.save_index_reference(built, ref_dir, seed=4)
    return built, ref_dir


def test_inspect_reference_info_verbatim(tmp_path):
    """The metadata .txt block streams through verbatim, once per resident
    residue (frac partials cover residues 0..r, src/index.cpp:144-156)."""
    built, ref_dir = _build(tmp_path)
    sfx = built.params.suffix
    txt = open(os.path.join(ref_dir, "metadata" + sfx + ".txt")).read()
    di = artifact.load_index_reference(ref_dir)
    out = io.StringIO()
    display_info(di, out)
    text = out.getvalue()
    assert text.startswith("Backbone tree: ")
    for r in range(built.params.r + 1):
        assert f"======= Partial index: {r} =======\n" + txt in text
    nse = built.colors.nse
    assert f"0\tNUM_COLORS\t{nse - 1}\n" in text


def test_inspect_fallback_info_block(tmp_path):
    """Without metadata .txt the reference synthesizes a '?' block
    (src/index.cpp:121-141); ours is byte-identical."""
    built, ref_dir = _build(tmp_path)
    sfx = built.params.suffix
    os.remove(os.path.join(ref_dir, "metadata" + sfx + ".txt"))
    di = artifact.load_index_reference(ref_dir)
    out = io.StringIO()
    display_info(di, out)
    text = out.getvalue()
    p = built.params
    ppos_desc = ", ".join(map(str, sorted(p.lsh.ppos, reverse=True)))
    expected = ("krepp version: ?\ndate: ?\nseed: ?\n"
                f"k: {p.k}\nw: {p.w}\nh: {p.h}\nm: {p.m}\nfrac: true\n"
                f"ppos_v: [{ppos_desc}]\n"
                "npos_v: [" + ", ".join(map(str, p.lsh.npos)) + "]\n"
                f"nrows: {p.nrows_local}\n"
                f"total_num_kmers: {built.nkmers}\n"
                "sdust-t: ?\nsdust-w: ?\n")
    assert expected in text


def test_inspect_outdegree_matches_pse(tmp_path):
    """OUTDEGREE histogram over the binary decomposition graph equals a
    direct recount from the exported pse table."""
    built, ref_dir = _build(tmp_path)
    di = artifact.load_index_reference(ref_dir)
    out = io.StringIO()
    display_info(di, out)
    pse = di.se_pse
    outdeg = np.bincount(
        np.concatenate([pse[1:, 0], pse[1:, 1]]).astype(np.int64),
        minlength=len(pse))[: len(pse)]
    vals, counts = np.unique(outdeg[1:], return_counts=True)
    for v, c in zip(vals, counts):
        assert f"0\tOUTDEGREE_COUNT\t{v}\t{c}\n" in out.getvalue()


def test_inspect_native_info(tmp_path):
    built, _ = _build(tmp_path)
    nat_dir = str(tmp_path / "nat_idx")
    artifact.save_native(built, nat_dir, seed=4)
    di = artifact.load_native_device(nat_dir)
    out = io.StringIO()
    display_info(di, out)
    text = out.getvalue()
    assert "seed: 4\n" in text
    assert f"total_num_kmers: {built.nkmers}\n" in text
    assert f"w: {built.params.w}\n" in text
    assert "sdust-t: 0\n" in text
