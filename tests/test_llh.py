"""Likelihood + Brent vs scalar oracle and scipy."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize_scalar

from krepp_tpu.core import llh as llh_mod

import oracle


def test_llh_values_match_oracle():
    k, h, th = 27, 11, 4
    f = llh_mod.make_llh(k, h, th)
    rng = np.random.default_rng(0)
    for _ in range(20):
        hist = rng.integers(0, 30, size=th + 1).astype(np.float64)
        uc = float(rng.integers(0, 120))
        rho = float(rng.uniform(0.1, 1.0))
        d = float(rng.uniform(1e-6, 0.4))
        got = float(f(jnp.asarray([d]), jnp.asarray(hist)[None], jnp.asarray([uc]),
                      jnp.asarray([rho]))[0])
        want = oracle.llh_oracle(d, list(hist), uc, rho, k, h, th)
        assert abs(got - want) < 1e-9 * max(1.0, abs(want)), (got, want)


def test_brent_matches_scalar_oracle():
    k, h, th = 27, 11, 4
    opt = llh_mod.make_optimizer(k, h, th)
    rng = np.random.default_rng(1)
    hists, ucs, rhos = [], [], []
    for _ in range(64):
        hists.append(rng.integers(0, 40, size=th + 1).astype(np.float64))
        ucs.append(float(rng.integers(0, 124)))
        rhos.append(float(rng.uniform(0.2, 1.0)))
    hist = np.stack(hists)
    uc = np.array(ucs)
    rho = np.array(rhos)
    d, v = opt(jnp.asarray(hist), jnp.asarray(uc), jnp.asarray(rho))
    d, v = np.asarray(d), np.asarray(v)
    for i in range(64):
        want_d, want_v = oracle.brent_oracle(
            lambda x: oracle.llh_oracle(x, list(hist[i]), uc[i], rho[i], k, h, th),
            1e-10, 0.5)
        assert abs(d[i] - want_d) < 5e-9, (i, d[i], want_d)
        assert abs(v[i] - want_v) < 1e-6 * max(1.0, abs(want_v))


def test_brent_finds_true_minimum():
    """Against scipy bounded minimisation on a few instances (to ~boost tol)."""
    k, h, th = 29, 13, 4
    opt = llh_mod.make_optimizer(k, h, th)
    hist = np.array([[30.0, 12.0, 5.0, 2.0, 1.0], [2.0, 1.0, 0.0, 0.0, 0.0]])
    uc = np.array([60.0, 119.0])
    rho = np.array([0.8, 0.5])
    d, v = opt(jnp.asarray(hist), jnp.asarray(uc), jnp.asarray(rho))
    for i in range(2):
        res = minimize_scalar(
            lambda x: oracle.llh_oracle(x, list(hist[i]), uc[i], rho[i], k, h, th),
            bounds=(1e-10, 0.5), method="bounded",
            options={"xatol": 1e-10})
        assert abs(float(d[i]) - res.x) < 5e-5
