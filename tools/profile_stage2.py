"""Isolate stage-2 costs on the 1k world: Brent lanes vs dense ops."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from krepp_tpu import configure

configure()

from krepp_tpu.core.llh import brent_find_minima, F

name = sys.argv[1] if len(sys.argv) > 1 else "1k"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

engine = bench.load_engine(name)


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


# pure Brent cost vs lane count
rng = np.random.default_rng(0)
for K in (8192, 32768, 131072, 524288):
    A = jnp.asarray(rng.integers(1, 50, K).astype(np.float64))
    Bx = A * 1.3
    uc = jnp.asarray(rng.integers(50, 120, K).astype(np.float64))
    rho = jnp.full((K,), 0.3, F)

    def run(A=A, Bx=Bx, uc=uc, rho=rho, K=K):
        return jax.jit(lambda a, b, u, r: brent_find_minima(
            lambda dd: engine._llh_fast(dd, a, b, u, r), (K,)))(A, Bx, uc, rho)

    timeit(f"brent {K} lanes", run)

# stage2 with Brent stubbed out
import krepp_tpu.core.llh as llh_mod
from krepp_tpu.core import codec

codes = bench.world_reads(name, B)
lengths = np.full(B, 150, np.int32)
leaf_ok = np.ones(engine.S, bool)
packed, vbits = codec.pack_codes_host(codes, lengths)
packed = jnp.asarray(packed)
vbits = None if vbits is None else jnp.asarray(vbits)
lengths_d = jnp.asarray(lengths)
leaf_ok_d = jnp.asarray(leaf_ok)
tables = engine._tables

real_brent = llh_mod.brent_on_mask
import krepp_tpu.query.engine as eng_mod


def fake_brent(llh_fast, A, Bx, uc, rho, mask, cap_divisors=(32, 8)):
    return A * 0.01, A * 0.0


@jax.jit
def s2_nobrent(tables, packed, vbits, lengths, leaf_ok):
    L = packed.shape[1] * 16
    codes = codec.unpack_codes(packed, lengths, L, vbits)
    po = engine._probe_impl(tables, codes, lengths)
    return engine._stage2_impl(*po[:5], leaf_ok)


# _stage2_lanes calls brent_find_minima (not brent_on_mask): patch that
real_bfm = eng_mod.brent_find_minima
eng_mod.brent_find_minima = lambda f, shape, **kw: (
    jnp.zeros(shape, F), jnp.zeros(shape, F))
timeit("probe+stage2 NO brent", lambda: s2_nobrent(
    tables, packed, vbits, lengths_d, leaf_ok_d))
eng_mod.brent_find_minima = real_bfm

# how many lanes actually carry matches?
@jax.jit
def count_keep(tables, packed, vbits, lengths, leaf_ok):
    L = packed.shape[1] * 16
    codes = codec.unpack_codes(packed, lengths, L, vbits)
    po = engine._probe_impl(tables, codes, lengths)
    hist_or, hist_rc = po[0], po[1]
    return (jnp.sum((jnp.sum(hist_or, -1) > 0)),
            jnp.sum((jnp.sum(hist_rc, -1) > 0)))

n_or, n_rc = jax.device_get(count_keep(
    tables, packed, vbits, lengths_d, leaf_ok_d))
print(f"match lanes: or={n_or} rc={n_rc} of {B}x{engine.S} "
      f"({(n_or + n_rc) / B:.1f} per read)")
