"""Round-4 dist-step breakdown with device_get-based timing.

block_until_ready does NOT block on the axon remote backend, so all
timings here fetch a (tiny) output with jax.device_get. Each variant is
compiled once (persistent cache) then timed over `--reps` calls.

Usage: python -u tools/profile_dist2.py [--batch 16384] [--world base]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--world", default="base")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from krepp_tpu import configure

    configure()
    import jax
    import jax.numpy as jnp

    import bench
    from krepp_tpu.core import codec

    engine = bench.load_engine(args.world)
    B = args.batch
    codes = bench.world_reads(args.world, B)
    lengths = np.full(B, 150, np.int32)
    leaf_ok = np.ones(engine.S, bool)
    packed, vbits = codec.pack_codes_host(codes, lengths)
    packed_d = jax.device_put(jnp.asarray(packed))
    vbits_d = None if vbits is None else jax.device_put(jnp.asarray(vbits))
    lengths_d = jax.device_put(jnp.asarray(lengths))
    leaf_ok_d = jax.device_put(jnp.asarray(leaf_ok))
    tables = engine._tables

    print(f"[prof] world={args.world} mode={engine.mode} B={B} "
          f"S={engine.S} W={engine.W} max_bucket={engine.di.max_bucket}",
          flush=True)

    def timeit(label, fn, fetch, reps=args.reps):
        t0 = time.time()
        out = fn()
        fetch(out)
        print(f"[prof] {label}: first(+compile) {time.time() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            fetch(out)
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"[prof] {label}: {med * 1e3:9.2f} ms "
              f"({B / med:8.0f} reads/s) min {ts[0]*1e3:.2f}", flush=True)
        return med

    def f_scalar(out):
        # fetch one element of the first output: waits for execution
        x = out[0] if isinstance(out, (tuple, list)) else out
        jax.device_get(x.ravel()[0] if hasattr(x, "ravel") else x)

    def f_all(out):
        jax.device_get(tuple(out) if isinstance(out, (tuple, list)) else out)

    # ---- production fused step (dist out_mode), full fetch
    fused = engine._get_full_jit("dist")
    timeit("fused dist + full fetch",
           lambda: fused(tables, packed_d, vbits_d, lengths_d, leaf_ok_d),
           f_all)
    timeit("fused dist, scalar fetch",
           lambda: fused(tables, packed_d, vbits_d, lengths_d, leaf_ok_d),
           f_scalar)

    # ---- probe only
    import functools

    probe = jax.jit(functools.partial(engine._probe_impl))

    def probe_in():
        codes_dev = codec.unpack_codes(packed_d, lengths_d,
                                       packed.shape[1] * 16, vbits_d)
        return codes_dev

    unpack = jax.jit(probe_in)
    timeit("unpack codes only", lambda: unpack(), f_scalar)
    codes_d = unpack()
    jax.device_get(codes_d.ravel()[0])

    timeit("probe only (stage1)",
           lambda: probe(tables, codes_d, lengths_d), f_scalar)

    # ---- strand hashes only
    sh = jax.jit(lambda c, l: engine._strand_hashes(c, l)[0])
    timeit("strand hashes only", lambda: sh(codes_d, lengths_d), f_scalar)

    # ---- probe without the heavy tail (timing only; results off)
    if engine.mode == "hybrid":
        real_mb = engine.di.max_bucket
        engine.di.max_bucket = engine.C0
        probe_nt = jax.jit(functools.partial(engine._probe_impl))
        timeit("probe only, NO heavy tail",
               lambda: probe_nt(tables, codes_d, lengths_d), f_scalar)
        engine.di.max_bucket = real_mb

    if engine.mode == "hybrid":
        # ---- hashes + routing + slot-row gather only (no epilogue)
        slots_d = tables[0]

        def gather_only(c, l):
            rix2, res2, valid, onmers = engine._strand_hashes(c, l)
            urow, resident = engine._urow(rix2, valid[None])
            sidx, hrow, resident = engine._route_rows(tables[3], urow,
                                                      resident)
            d = slots_d[sidx]
            return jnp.sum(d, dtype=jnp.uint32)

        g = jax.jit(gather_only)
        timeit("hashes+route+gather", lambda: g(codes_d, lengths_d),
               f_scalar)

        # ---- epilogue alone (on pre-gathered rows)
        rix2, res2, valid, onmers = jax.jit(engine._strand_hashes)(
            codes_d, lengths_d)
        P = int(res2.shape[-1])

        def epi(d4, res2):
            cnt = d4[..., 0].astype(jnp.int32)
            light = cnt <= engine.C0
            return engine._dense_epilogue(d4, tables[4], res2, light,
                                          B, P)[0]

        rng = np.random.default_rng(0)
        width = tables[0].shape[1]
        d4 = jax.device_put(jnp.asarray(
            rng.integers(0, 3, (2, B, P, width)).astype(np.uint32)))
        res2_d = jax.device_put(res2)
        jax.device_get(res2_d.ravel()[0])
        e = jax.jit(epi)
        timeit("dense epilogue only", lambda: e(d4, res2_d), f_scalar)

    # ---- stage 2 on probe outputs
    pout = probe(tables, codes_d, lengths_d)
    jax.device_get(pout[4].ravel()[0])
    s2 = jax.jit(lambda *a: engine._stage2_lanes(*a, leaf_ok_d,
                                                 max(8 * B, 4096))["d_f"])
    timeit("stage2 lanes only", lambda: s2(*pout[:5]), f_scalar)

    # ---- raw gather reference at probe volume
    nrows = tables[0].shape[0]
    width = tables[0].shape[1]
    NPr = 2 * B * (codes.shape[1] - engine.lsh.k + 1)
    ridx = jax.device_put(jnp.asarray(
        np.random.default_rng(1).integers(0, nrows, NPr).astype(np.int32)))

    def raw_gather(idx):
        return jnp.sum(tables[0][idx], dtype=jnp.uint32)

    rg = jax.jit(raw_gather)
    timeit(f"raw gather {NPr} rows x {width} u32",
           lambda: rg(ridx), f_scalar)


if __name__ == "__main__":
    main()
