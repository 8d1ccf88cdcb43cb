"""Marginal cost of each dist-step component, measured by stubbing it out
of the PRODUCTION fused program (out_mode="dist") and re-timing.

device_get of a scalar output is the only reliable sync on the axon
remote backend. Usage: python -u tools/profile_marginal.py [world] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from krepp_tpu import configure

configure()

import jax
import jax.numpy as jnp

import bench
from krepp_tpu.core import codec
from krepp_tpu.core.llh import F

name = sys.argv[1] if len(sys.argv) > 1 else "base"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

engine = bench.load_engine(name)
codes = bench.world_reads(name, B)
lengths = np.full(B, 150, np.int32)
leaf_ok = np.ones(engine.S, bool)
packed, vbits = codec.pack_codes_host(codes, lengths)
packed_d = jnp.asarray(packed)
vbits_d = None if vbits is None else jnp.asarray(vbits)
lengths_d = jnp.asarray(lengths)
leaf_ok_d = jnp.asarray(leaf_ok)
tables = engine._tables


def timeit(label, fn, reps=5):
    t0 = time.time()
    out = fn()
    jax.device_get(np.asarray(out[0]).ravel()[0] if isinstance(out, tuple)
                   else out.ravel()[0])
    print(f"[prof] {label}: first {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        x = out[0] if isinstance(out, (tuple, list)) else out
        jax.device_get(x.ravel()[0])
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"[prof] {label}: {med * 1e3:9.2f} ms ({B / med:8.0f} reads/s) "
          f"min {ts[0] * 1e3:.2f}", flush=True)
    return med


def fused():
    return jax.jit(engine._full_impl, static_argnames=("exact", "out_mode",
                                                       "tier", "lane_exact"))


prod = engine._get_full_jit("dist")
base_ms = timeit("production dist", lambda: prod(
    tables, packed_d, vbits_d, lengths_d, leaf_ok_d))

# ---- stub Brent (zeroed solver) inside the production program
import krepp_tpu.core.llh as llh_mod
import krepp_tpu.query.engine as eng_mod

real_bom = eng_mod.brent_on_mask


def fake_bom(llh_fast, A, Bx, uc, rho, mask, cap_divisors=(32, 8)):
    return A * 1e-3, A * 0.0


eng_mod.brent_on_mask = fake_bom
nb = jax.jit(lambda *a: engine._full_impl(*a, out_mode="dist"))
timeit("dist, NO brent", lambda: nb(
    tables, packed_d, vbits_d, lengths_d, leaf_ok_d))
eng_mod.brent_on_mask = real_bom

# ---- stub the heavy tail
real_mb = engine.di.max_bucket
engine.di.max_bucket = engine.C0
nt = jax.jit(lambda *a: engine._full_impl(*a, out_mode="dist"))
timeit("dist, NO heavy tail", lambda: nt(
    tables, packed_d, vbits_d, lengths_d, leaf_ok_d))

# ---- both stubbed
eng_mod.brent_on_mask = fake_bom
nbt = jax.jit(lambda *a: engine._full_impl(*a, out_mode="dist"))
timeit("dist, NO brent NO tail", lambda: nbt(
    tables, packed_d, vbits_d, lengths_d, leaf_ok_d))
eng_mod.brent_on_mask = real_bom
engine.di.max_bucket = real_mb

# ---- stub stage 2 entirely (probe + lane extraction only)
real_s2 = engine._stage2_core


def fake_s2(idx, lv, h_or, h_rc, minall_or, minall_rc, onmers, leaf_ok,
            lane_over):
    K = idx.shape[0]
    Bb = minall_or.shape[0]
    z = jnp.zeros((K,), F)
    zi = jnp.zeros((K,), jnp.int32)
    return dict(idx=idx, lv=lv, lb=zi, ls=zi, lane_over=lane_over,
                present_l=lv, hist_f=h_or, d_f=z, v_f=z,
                mc_f=zi, uc_f=z, rho_l=z,
                best_slot=jnp.zeros((Bb,), jnp.int32),
                best_d=jnp.zeros((Bb,), F),
                hist_c=jnp.zeros((Bb, engine.th + 1), F),
                uc_c=jnp.zeros((Bb,), F), rho_c=jnp.zeros((Bb,), F),
                v_c=jnp.zeros((Bb,), F), ratio_l=z)


engine._stage2_core = fake_s2
ns2 = jax.jit(lambda *a: engine._full_impl(*a, out_mode="dist"))
timeit("dist, NO stage2 math", lambda: ns2(
    tables, packed_d, vbits_d, lengths_d, leaf_ok_d))
engine._stage2_core = real_s2

# ---- stub the lane compaction of stage 2 (keep probe, trivial lanes)
real_pal = engine._probe_and_lanes


def fake_lanes(tables, codes, lengths, leaf_ok, lane_cap, exact, tier):
    po = engine._probe_dispatch(tables, codes, lengths, exact, tier)
    onmers, ov = po[4], po[5]
    Bb = codes.shape[0]
    K = 8
    idx = jnp.arange(K, dtype=jnp.int32)
    L = real_s2(idx, idx < 4, jnp.zeros((K, engine.th + 1), jnp.int32),
                jnp.zeros((K, engine.th + 1), jnp.int32), po[2], po[3],
                onmers, leaf_ok, jnp.bool_(False))
    return L, onmers, ov


engine._probe_and_lanes = fake_lanes
nl = jax.jit(lambda *a: engine._full_impl(*a, out_mode="dist"))
timeit("dist, probe+tiny stage2", lambda: nl(
    tables, packed_d, vbits_d, lengths_d, leaf_ok_d))
engine._probe_and_lanes = real_pal
