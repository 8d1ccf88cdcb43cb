"""Winnowing vs the oracle transliteration of RSeq::extract_mers."""

import numpy as np
import pytest

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.core import codec, minimizer
from krepp_tpu.core.minimizer import extract_sequence_mers

import oracle


def make_params(k=27, h=11, w=35, m=4, r=1, frac=True, seed=5):
    return IndexParams(lsh=LSHParams.generate(k, h, m, seed=seed), w=w, r=r, frac=frac)


def rand_seq(rng, n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    p = [0.23, 0.23, 0.23, 0.23, 0.08] if with_n else None
    return "".join(rng.choice(list(alpha), size=n, p=p))


@pytest.mark.parametrize("with_n", [False, True])
@pytest.mark.parametrize("n", [40, 123, 1000])
def test_extract_matches_oracle(with_n, n):
    rng = np.random.default_rng(n + with_n)
    params = make_params()
    lsh = params.lsh
    seq = rand_seq(rng, n, with_n)
    got = minimizer.extract_sequence_mers(codec.seq_to_codes(seq), params)
    kept_o, c1_o, c2_o = oracle.extract_mers_oracle(
        seq, lsh.k, params.w, list(lsh.ppos), list(lsh.npos),
        lsh.m, params.r, params.frac)
    if n < params.w:
        assert got is None
        return
    rows, res, c1, c2 = got
    assert len(rows) == len(kept_o)
    for i, (lr, rr) in enumerate(kept_o):
        assert int(rows[i]) == lr, i
        assert int(res[i]) == rr, i
    assert np.array_equal(np.sort(c1), np.sort(np.array(c1_o, dtype=np.uint32)))
    assert np.array_equal(np.sort(c2), np.sort(np.array(c2_o, dtype=np.uint32)))


def test_short_tail_zero_entry():
    """A sequence with w <= len < w + something and trailing N forces the
    end-of-sequence emission path."""
    rng = np.random.default_rng(7)
    params = make_params(w=35)
    # valid prefix of exactly k bases after an N reset near the end
    seq = rand_seq(rng, 60) + "N" + rand_seq(rng, 28)
    lsh = params.lsh
    rows, res, c1, c2 = minimizer.extract_sequence_mers(codec.seq_to_codes(seq), params)
    kept_o, c1_o, c2_o = oracle.extract_mers_oracle(
        seq, lsh.k, params.w, list(lsh.ppos), list(lsh.npos),
        lsh.m, params.r, params.frac)
    assert [(int(a), int(b)) for a, b in zip(rows, res)] == kept_o


def test_genome_rho():
    rng = np.random.default_rng(9)
    params = make_params()
    contigs = [codec.seq_to_codes(rand_seq(rng, 3000)) for _ in range(3)]
    rows, res, rho = minimizer.extract_genome_mers(contigs, params)
    assert 0 < rho <= 1.5
    assert len(rows) == len(res) > 0


# ---------------------------------------------------------------- device path

from krepp_tpu.core import winnow_device
from krepp_tpu.core.hll import HyperLogLog


@pytest.mark.parametrize("n", [40, 123, 1000, 5000])
@pytest.mark.parametrize("with_n", [False, True])
def test_device_winnow_matches_host(n, with_n):
    rng = np.random.default_rng(n * 7 + with_n)
    params = make_params()
    seq = rand_seq(rng, n, with_n)
    codes = codec.seq_to_codes(seq)
    host = minimizer.extract_sequence_mers(codes, params)
    dev = winnow_device.extract_sequence_mers_device(codes, params)
    if n < params.w:
        assert host is None and dev is None
        return
    h_rows, h_res, h_c1, h_c2 = host
    d_rows, d_res, d_c1, d_c2 = dev
    # device output is deduplicated and sorted
    key_h = np.unique(h_rows.astype(np.uint64) << np.uint64(32) | h_res)
    key_d = d_rows.astype(np.uint64) << np.uint64(32) | d_res
    assert np.array_equal(key_d, key_h)
    hll1 = HyperLogLog(12); hll1.add_many(h_c1)
    hll2 = HyperLogLog(12); hll2.add_many(h_c2)
    assert np.array_equal(hll1.M, d_c1)
    assert np.array_equal(hll2.M, d_c2)


def test_device_winnow_genome_rho():
    rng = np.random.default_rng(4)
    params = make_params()
    contigs = [codec.seq_to_codes(rand_seq(rng, 3000)) for _ in range(3)]
    r0 = minimizer.extract_genome_mers(contigs, params)
    r1 = winnow_device.extract_genome_mers_device(contigs, params)
    from krepp_tpu.index.build import _dedupe_genome
    k0 = _dedupe_genome(r0[0], r0[1])
    k1 = _dedupe_genome(r1[0], r1[1])
    assert np.array_equal(k0[0], k1[0]) and np.array_equal(k0[1], k1[1])
    assert abs(r0[2] - r1[2]) < 1e-12


def test_device_winnow_chunked_matches_host(monkeypatch):
    """Chunked long-contig path (tiny tiles) vs the host reference."""
    from krepp_tpu.core import winnow_device as wd

    monkeypatch.setattr(wd, "_CHUNK", 2048)
    rng = np.random.default_rng(71)
    params = make_params()
    for n, with_n in ((6000, False), (9000, True), (4100, True)):
        seq = rand_seq(rng, n, with_n)
        codes = codec.seq_to_codes(seq)
        host = minimizer.extract_sequence_mers(codes, params)
        dev = wd.extract_sequence_mers_device(codes, params)
        h_rows, h_res, h_c1, h_c2 = host
        d_rows, d_res, d_c1, d_c2 = dev
        key_h = np.unique(h_rows.astype(np.uint64) << np.uint64(32) | h_res)
        key_d = np.unique(d_rows.astype(np.uint64) << np.uint64(32) | d_res)
        assert np.array_equal(key_d, key_h), (n, with_n)
        hll1 = HyperLogLog(12); hll1.add_many(h_c1)
        hll2 = HyperLogLog(12); hll2.add_many(h_c2)
        assert np.array_equal(hll1.M, d_c1), (n, with_n)
        assert np.array_equal(hll2.M, d_c2), (n, with_n)


def test_device_winnow_chunked_trailing_n_fallback(monkeypatch):
    """Trailing N-flood forces the exact host fallback."""
    from krepp_tpu.core import winnow_device as wd

    monkeypatch.setattr(wd, "_CHUNK", 2048)
    rng = np.random.default_rng(72)
    params = make_params()
    seq = rand_seq(rng, 7000) + "N" * 2500 + rand_seq(rng, 30)
    codes = codec.seq_to_codes(seq)
    host = minimizer.extract_sequence_mers(codes, params)
    dev = wd.extract_sequence_mers_device(codes, params)
    key_h = np.unique(host[0].astype(np.uint64) << np.uint64(32) | host[1])
    key_d = np.unique(dev[0].astype(np.uint64) << np.uint64(32) | dev[1])
    assert np.array_equal(key_d, key_h)


def test_native_extractor_matches_host():
    """csrc/extract.c must reproduce extract_sequence_mers exactly:
    kept (row, residual) multisets, and the HLL register maxima."""
    from krepp_tpu.core import native_extract
    from krepp_tpu.core.hll import HyperLogLog

    if not native_extract.native_available():
        import pytest

        pytest.skip("no C compiler for the native extractor")
    rng = np.random.default_rng(77)
    for trial in range(6):
        k = int(rng.integers(19, 32))
        h = int(rng.integers(max(3, k - 16), 16))
        w = k + int(rng.integers(0, 10))
        m = int(rng.integers(1, 5))
        r = int(rng.integers(0, m))
        frac = bool(rng.integers(0, 2))
        lsh = LSHParams.generate(k=k, h=h, m=m, seed=trial)
        params = IndexParams(lsh=lsh, w=w, r=r, frac=frac)
        n = int(rng.integers(w, 4000))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        # sprinkle N runs (also at the tail, to hit final-emission quirks)
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, n))
            codes[p: p + int(rng.integers(1, 30))] = 4
        out_h = extract_sequence_mers(codes, params)
        out_n = native_extract.extract_sequence_mers_native(codes, params)
        assert (out_h is None) == (out_n is None)
        if out_h is None:
            continue
        rows_h, res_h, c1h, c2h = out_h
        rows_n, res_n, c1n, c2n = out_n
        key_h = np.sort(rows_h.astype(np.uint64) << np.uint64(32) | res_h)
        key_n = np.sort(rows_n.astype(np.uint64) << np.uint64(32) | res_n)
        assert np.array_equal(key_h, key_n), (trial, k, h, w, m, r, frac)
        h1 = HyperLogLog(12)
        h1.add_many(c1h)
        h2 = HyperLogLog(12)
        h2.add_many(c2h)
        assert np.array_equal(h1.M, c1n)
        assert np.array_equal(h2.M, c2n)
