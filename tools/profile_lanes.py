"""Break down the production (lane-capped) fused dist step on the 1k world."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from krepp_tpu import configure

configure()

from krepp_tpu.core import codec
from krepp_tpu.core.llh import F, brent_find_minima

name = sys.argv[1] if len(sys.argv) > 1 else "1k"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

engine = bench.load_engine(name)
codes = bench.world_reads(name, B)
lengths = np.full(B, 150, np.int32)
leaf_ok = np.ones(engine.S, bool)
packed, vbits = codec.pack_codes_host(codes, lengths)
packed = jnp.asarray(packed)
vbits = None if vbits is None else jnp.asarray(vbits)
lengths_d = jnp.asarray(lengths)
leaf_ok_d = jnp.asarray(leaf_ok)
tables = engine._tables
S = engine.S
K = max(8 * B, 4096)


def timeit(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label:34s} {best * 1e3:9.1f} ms")
    return out


@jax.jit
def probe(tables, packed, vbits, lengths):
    L = packed.shape[1] * 16
    c = codec.unpack_codes(packed, lengths, L, vbits)
    return engine._probe_impl(tables, c, lengths)


@jax.jit
def probe_lanes(tables, packed, vbits, lengths, leaf_ok):
    L = packed.shape[1] * 16
    c = codec.unpack_codes(packed, lengths, L, vbits)
    po = engine._probe_impl(tables, c, lengths)
    return engine._stage2_lanes(*po[:5], leaf_ok, K)


@jax.jit
def lanes_nobrent(tables, packed, vbits, lengths, leaf_ok):
    import krepp_tpu.query.engine as em
    real = em.brent_find_minima
    em.brent_find_minima = lambda f, shape, **kw: (
        jnp.full(shape, 0.01, F), jnp.zeros(shape, F))
    try:
        L = packed.shape[1] * 16
        c = codec.unpack_codes(packed, lengths, L, vbits)
        po = engine._probe_impl(tables, c, lengths)
        return engine._stage2_lanes(*po[:5], leaf_ok, K)
    finally:
        em.brent_find_minima = real


timeit("probe", lambda: probe(tables, packed, vbits, lengths_d))
timeit("probe+lanes (prod K)", lambda: probe_lanes(
    tables, packed, vbits, lengths_d, leaf_ok_d))
timeit("probe+lanes NO brent", lambda: lanes_nobrent(
    tables, packed, vbits, lengths_d, leaf_ok_d))

# pure brent at 2K lanes, correctly jitted once
rng = np.random.default_rng(0)
KK = 2 * K
A = jnp.asarray(rng.integers(0, 50, KK).astype(np.float64))
Bx = A * 1.3
uc = jnp.asarray(rng.integers(50, 120, KK).astype(np.float64))
rho = jnp.full((KK,), 0.3, F)


@jax.jit
def pure_brent(a, b, u, r):
    return brent_find_minima(
        lambda dd: engine._llh_fast(dd, a, b, u, r), (KK,))


timeit(f"pure brent {KK} lanes", lambda: pure_brent(A, Bx, uc, rho))

full = engine._get_full_jit("dist")
timeit("full fused dist step", lambda: full(
    tables, packed, vbits, lengths_d, leaf_ok_d))
