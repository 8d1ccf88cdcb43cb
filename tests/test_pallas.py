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


def test_probe_epilogue_matches_xla_engine():
    """The fused Pallas probe epilogue (interpret mode) must reproduce the
    XLA direct-probe outputs bit-for-bit on a real small index."""
    import jax

    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.engine import QueryEngine
    from krepp_tpu.testing import build_world_index, sample_read_codes

    built, genomes, _ = build_world_index(seed=11, nleaves=6, glen=1500, m=2)
    di = DeviceIndex.from_built(built)
    engine = QueryEngine(di, hdist_th=4)
    assert engine.mode == "hybrid"
    rng = np.random.default_rng(12)
    codes = sample_read_codes(rng, genomes, 32, rlen=150, mut=0.08)
    # inject Ns + a short read
    codes[0, 30:34] = 4
    lengths = np.full(32, 150, np.int32)
    lengths[1] = 97

    probe = jax.jit(engine._probe_impl)
    engine._use_pallas = False
    ref = jax.device_get(tuple(probe(
        engine._tables, jnp.asarray(codes), jnp.asarray(lengths))))
    engine._use_pallas = True
    probe2 = jax.jit(engine._probe_impl)
    got = jax.device_get(tuple(probe2(
        engine._tables, jnp.asarray(codes), jnp.asarray(lengths))))
    for a, b in zip(ref[:5], got[:5]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
