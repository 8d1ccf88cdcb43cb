"""Pallas kernel contract vs the XLA reference implementation (interpret
mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from krepp_tpu.query.pallas_kernels import hdist_chunk, hdist_chunk_xla


def test_hdist_chunk_matches_xla():
    rng = np.random.default_rng(0)
    N, C = 3000, 8
    res = rng.integers(0, 2 ** 32, N, dtype=np.uint32)
    enc = rng.integers(0, 2 ** 32, (N, C), dtype=np.uint32)
    # plant close matches
    for i in range(0, N, 7):
        enc[i, i % C] = res[i] ^ np.uint32(1 << (i % 16))
    cnt = rng.integers(0, C + 1, N, dtype=np.int32)
    hd_p, mn_p = hdist_chunk(jnp.asarray(res), jnp.asarray(enc),
                             jnp.asarray(cnt), th=4, interpret=True)
    hd_x, mn_x = hdist_chunk_xla(jnp.asarray(res), jnp.asarray(enc),
                                 jnp.asarray(cnt), th=4)
    assert np.array_equal(np.asarray(hd_p), np.asarray(hd_x))
    assert np.array_equal(np.asarray(mn_p), np.asarray(mn_x))


def test_hdist_chunk_nonmultiple_tile():
    rng = np.random.default_rng(1)
    N, C = 1537, 4
    res = rng.integers(0, 2 ** 32, N, dtype=np.uint32)
    enc = rng.integers(0, 2 ** 32, (N, C), dtype=np.uint32)
    cnt = np.full(N, C, np.int32)
    hd_p, mn_p = hdist_chunk(jnp.asarray(res), jnp.asarray(enc),
                             jnp.asarray(cnt), th=4, interpret=True)
    hd_x, mn_x = hdist_chunk_xla(jnp.asarray(res), jnp.asarray(enc),
                                 jnp.asarray(cnt), th=4)
    assert np.array_equal(np.asarray(hd_p), np.asarray(hd_x))
    assert np.array_equal(np.asarray(mn_p), np.asarray(mn_x))
