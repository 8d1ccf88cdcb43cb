"""SDUST masker + masked winnowing path."""

import numpy as np
import pytest

from krepp_tpu.core import minimizer, sdust as sdust_mod
from krepp_tpu.core.masked_extract import extract_sequence_mers_masked
from krepp_tpu.core.codec import seq_to_codes
from krepp_tpu.params import IndexParams, LSHParams


def test_sdust_masks_homopolymer():
    seq = "ACGTTGCA" * 10 + "A" * 80 + "GCTAGCTACGATCGA" * 6
    iv = sdust_mod.sdust(seq_to_codes(seq), 20, 64)
    assert len(iv) >= 1
    s, f = iv[0]
    # the poly-A run must be inside a masked interval
    assert s <= 80 + 2 and f >= 150, iv


def test_sdust_random_mostly_unmasked():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    iv = sdust_mod.sdust(codes, 20, 64)
    masked = sum(f - s for s, f in iv)
    assert masked < 500, iv


def test_sdust_tandem_repeat():
    seq = "ACGATCGATCCGTA" * 5 + "ATATATATATATATATATATATATATAT" + "GCGTACGTTAGC" * 5
    iv = sdust_mod.sdust(seq_to_codes(seq), 20, 64)
    assert any(s <= 72 and f >= 96 for s, f in iv), iv


def test_masked_extract_no_regions_equals_plain():
    rng = np.random.default_rng(5)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 4, seed=5), w=35,
                         r=1, frac=True)
    seq = "".join(rng.choice(list("ACGTN"), size=2000,
                             p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    codes = seq_to_codes(seq)
    plain = minimizer.extract_sequence_mers(codes, params)
    masked = extract_sequence_mers_masked(codes, params)
    assert np.array_equal(plain[0], masked[0])
    assert np.array_equal(plain[1], masked[1])
    assert np.array_equal(np.sort(plain[2]), np.sort(masked[2]))
    assert np.array_equal(np.sort(plain[3]), np.sort(masked[3]))


def test_masked_extract_skips_masked_kmers():
    rng = np.random.default_rng(6)
    import dataclasses
    params = IndexParams(lsh=LSHParams.generate(27, 11, 2, seed=5), w=35,
                         r=1, frac=True, sdust_t=20, sdust_w=64)
    body = "".join(rng.choice(list("ACGT"), size=600))
    seq = body[:300] + "A" * 120 + body[300:]
    codes = seq_to_codes(seq)
    rows_m, res_m, c1m, c2m = extract_sequence_mers_masked(codes, params)
    p0 = dataclasses.replace(params, sdust_t=0, sdust_w=0)
    rows_p, res_p, c1p, c2p = extract_sequence_mers_masked(codes, p0)
    # masking must remove some k-mers relative to the unmasked run
    assert len(rows_m) < len(rows_p)
    # c1 counts masked k-mers too, but loses k-1 k-mers to the run reset at
    # the region end (ref: src/rqseq.cpp:96-106)
    assert len(c1p) - len(c1m) == params.k - 1
