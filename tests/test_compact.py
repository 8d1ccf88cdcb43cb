"""Rank-select mask compaction vs the brute-force definition."""

import numpy as np
import jax

from krepp_tpu.core.compact import (compact_mask_indices,
                                    compact_mask_indices_strided)


def _oracle(mask, K):
    N = len(mask)
    idx = np.flatnonzero(mask)[:K]
    out = np.full(K, N, np.int32)
    out[:len(idx)] = idx
    return out, int(mask.sum())


def test_compact_small_and_large():
    rng = np.random.default_rng(0)
    for N, dens, K in [(100, 0.3, 16), (4096, 0.01, 64), (5000, 0.5, 100),
                       (1 << 17, 0.004, 1024), (1 << 17, 0.2, 4096),
                       (1000003, 0.001, 2048)]:
        mask = rng.random(N) < dens
        ref_idx, ref_n = _oracle(mask, K)
        idx, n = jax.jit(compact_mask_indices,
                         static_argnames="K")(mask, K=K)
        assert int(n) == ref_n, (N, dens, K)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_compact_edge_cases():
    # empty mask, full mask, K > n_set, single set lane at each boundary
    for mask in [np.zeros(70000, bool), np.ones(70000, bool)]:
        K = 128
        ref_idx, ref_n = _oracle(mask, K)
        idx, n = compact_mask_indices(mask, K)
        assert int(n) == ref_n
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    for pos in [0, 31, 32, 69999]:
        mask = np.zeros(70000, bool)
        mask[pos] = True
        idx, n = compact_mask_indices(mask, 8)
        assert int(n) == 1 and int(idx[0]) == pos and int(idx[1]) == 70000


def test_strided_wrapper_exact():
    rng = np.random.default_rng(3)
    mask = rng.random(1 << 18) < 0.01
    ref_idx, ref_n = _oracle(mask, 4096)
    idx, n, over = compact_mask_indices_strided(mask, 4096)
    assert int(n) == ref_n and not bool(over)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
