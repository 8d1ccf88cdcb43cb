"""Brent while_loop anatomy: iterations executed, per-iteration cost."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from krepp_tpu import configure

configure()

import krepp_tpu.core.llh as llh_mod
from krepp_tpu.core.llh import F, brent_find_minima, make_llh_fast

llh_fast = make_llh_fast(29, 13, 4)
K = 32768
rng = np.random.default_rng(0)
A = jnp.asarray(rng.integers(1, 50, K).astype(np.float64))
Bx = A * 1.3
uc = jnp.asarray(rng.integers(50, 120, K).astype(np.float64))
rho = jnp.full((K,), 0.3, F)


def timeit(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label:40s} {best * 1e3:9.2f} ms")
    return out


# how many iterations does the real solver run?
def with_count(max_iter):
    @jax.jit
    def run(a, b, u, r):
        return brent_find_minima(
            lambda dd: llh_fast(dd, a, b, u, r), (K,), max_iter=max_iter)
    return lambda: run(A, Bx, uc, rho)


for mi in (10, 20, 40, 80, 200):
    timeit(f"brent max_iter={mi}", with_count(mi))

# single llh_fast evaluation cost
@jax.jit
def one_eval(a, b, u, r):
    d = jnp.full((K,), 0.1, F)
    return llh_fast(d, a, b, u, r)


timeit("one llh_fast eval (f64)", one_eval)


# fori-unrolled 40 evals (no while_loop) to separate loop overhead
@jax.jit
def chain40(a, b, u, r):
    d = jnp.full((K,), 0.37, F)

    def body(i, d):
        return 0.4 * jnp.abs(jnp.tanh(llh_fast(d * 0.001, a, b, u, r))) * 0.001 + d * 0.5

    return jax.lax.fori_loop(0, 40, body, d)


timeit("40 chained llh_fast evals (fori)", chain40)
