"""Stage-level timing of the dist hot path on the current backend.

Usage: python tools/profile_dist.py [--batch 4096] [--reps 8]
Prints per-stage wall times (probe / stage2 / fused / fetch) to stderr.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps, sync):
    fn()  # warm
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 4]  # lower-quartile (quiet-pool) estimate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    from krepp_tpu import configure

    configure()
    from krepp_tpu.index import artifact
    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.engine import QueryEngine
    from krepp_tpu.testing import make_world_codes, sample_read_codes

    cache = os.path.expanduser(
        f"~/.cache/krepp_tpu_bench/idx-{args.seed}-24-500000")
    built = artifact.load_native(cache)
    rng0 = np.random.default_rng(args.seed)
    _, genomes = make_world_codes(rng0, nleaves=24, glen=500_000, rate=0.05)
    di = DeviceIndex.from_built(built)
    engine = QueryEngine(di, hdist_th=4)
    print(f"mode={engine.mode} S={engine.S} W={engine.W} "
          f"max_bucket={di.max_bucket} nrows_u={di.nrows_u}", file=sys.stderr)

    B = args.batch
    rng = np.random.default_rng(args.seed + 1)
    codes = sample_read_codes(rng, genomes, B, rlen=150, mut=0.05)
    lengths = np.full(B, 150, np.int32)
    leaf_ok = np.ones(engine.S, bool)

    jcodes = jax.device_put(np.asarray(codes))
    jlen = jax.device_put(lengths)
    jok = jax.device_put(leaf_ok)

    def sync(x):
        jax.block_until_ready(x)

    # probe only
    probe = jax.jit(engine._probe_impl)
    t_probe = timeit(lambda: probe(engine._tables, jcodes, jlen), args.reps,
                     sync)
    print(f"probe only:   {t_probe * 1e3:8.2f} ms", file=sys.stderr)

    # stage2 only (on probe outputs)
    pout = jax.block_until_ready(probe(engine._tables, jcodes, jlen))
    s2 = jax.jit(engine._stage2_impl)
    t_s2 = timeit(lambda: s2(*pout[:5], jok), args.reps, sync)
    print(f"stage2 only:  {t_s2 * 1e3:8.2f} ms", file=sys.stderr)

    # fused, dist mode, no fetch
    fused = engine._get_full_jit("dist")
    t_fused = timeit(lambda: fused(engine._tables, jcodes, jlen, jok),
                     args.reps, sync)
    print(f"fused (dist): {t_fused * 1e3:8.2f} ms", file=sys.stderr)

    # fused + fetch
    def full_fetch():
        out = fused(engine._tables, jcodes, jlen, jok)
        return jax.device_get(tuple(out))

    t_ff = timeit(full_fetch, args.reps, lambda x: None)
    print(f"fused+fetch:  {t_ff * 1e3:8.2f} ms", file=sys.stderr)
    print(f"-> {B / t_ff:.0f} reads/s unpipelined; "
          f"{B / t_fused:.0f} reads/s device-bound", file=sys.stderr)


if __name__ == "__main__":
    main()
