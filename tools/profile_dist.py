"""Stage-level TPU profiling of the dist pipeline.

Builds (or loads) the bench-scale index, then times each stage of the
query engine separately on the current backend:

  probe   : stage-1 LSH probe + bucket scan + histograms
  stage2  : filters + batched Brent ML + strand resolution (given probe out)
  full    : the fused production program
  brent   : the Brent solver alone at production lane counts

Usage: python tools/profile_dist.py [--batch 4096] [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_index(cache: str, seed=7, nleaves=24, glen=500_000) -> None:
    """Build the bench index in a CPU-backend subprocess (fast compiles)."""
    if os.path.exists(os.path.join(cache, "meta.json")):
        return
    code = (
        "from krepp_tpu import configure; configure();\n"
        "from krepp_tpu.testing import build_world_index\n"
        "from krepp_tpu.index import artifact\n"
        f"built, _, _ = build_world_index(seed={seed}, nleaves={nleaves}, "
        f"glen={glen}, rate=0.05)\n"
        f"artifact.save_native(built, {cache!r})\n"
        "print('built', built.nkmers)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    t0 = time.time()
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(f"[prof] cpu-subprocess index build: {time.time() - t0:.1f}s",
          file=sys.stderr)


def timeit(fn, n, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best.append(time.perf_counter() - t0)
    return min(best), float(np.median(best))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from krepp_tpu import configure

    configure()
    import jax
    import jax.numpy as jnp

    from krepp_tpu.index import artifact
    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.engine import QueryEngine
    from krepp_tpu.testing import make_world_codes, sample_read_codes

    cache = os.path.expanduser(
        f"~/.cache/krepp_tpu_bench/idx-{args.seed}-24-500000")
    ensure_index(cache, seed=args.seed)
    built = artifact.load_native(cache)
    rng0 = np.random.default_rng(args.seed)
    _, genomes = make_world_codes(rng0, nleaves=24, glen=500_000, rate=0.05)
    di = DeviceIndex.from_built(built)
    engine = QueryEngine(di, hdist_th=4)
    print(f"[prof] index: {built.nkmers} kmers, nrows {len(built.inc)}, "
          f"max_bucket {di.max_bucket}, S {engine.S}, W {engine.W}, "
          f"device {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(args.seed + 1)
    B, rlen = args.batch, 150
    codes = jnp.asarray(sample_read_codes(rng, genomes, B, rlen=rlen))
    lengths = jnp.full((B,), rlen, jnp.int32)
    leaf_ok = jnp.ones(engine.S, bool)

    probe = jax.jit(engine._probe_impl)
    t0 = time.time()
    pout = probe(engine._tables, codes, lengths)
    jax.block_until_ready(pout)
    print(f"[prof] probe compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    stage2 = jax.jit(engine._stage2_impl)
    t0 = time.time()
    s2out = stage2(*pout[:5], leaf_ok)
    jax.block_until_ready(s2out)
    print(f"[prof] stage2 compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    fout = engine._full_jit(engine._tables, codes, lengths, leaf_ok)
    jax.block_until_ready(fout)
    print(f"[prof] full compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    tp_min, tp_med = timeit(lambda c: probe(engine._tables, c, lengths),
                            args.iters, codes)
    t2_min, t2_med = timeit(lambda *a: stage2(*a, leaf_ok), args.iters, *pout[:5])
    tf_min, tf_med = timeit(
        lambda c: engine._full_jit(engine._tables, c, lengths, leaf_ok),
        args.iters, codes)

    # Brent alone at the compacted lane count used in production
    from krepp_tpu.core.llh import brent_on_mask

    hist_or = pout[0]
    S, X = engine.S, engine.th + 1
    hist2 = jnp.concatenate([hist_or, pout[1]], 0).astype(jnp.float64)
    uc2 = jnp.zeros((2 * B, S), jnp.float64) + 40.0
    rho2 = jnp.full((2 * B, S), 0.9, jnp.float64)
    keep2 = (jnp.sum(hist2, -1) > 0)
    nlanes = int(jnp.sum(keep2))
    brent = jax.jit(functools.partial(brent_on_mask, engine._llh))
    tb_min, tb_med = timeit(lambda: brent(hist2, uc2, rho2, keep2), args.iters)

    print(f"[prof] B={B} live_lanes={nlanes}/{2*B*S}", file=sys.stderr)
    for name, (mn, md) in [("probe", (tp_min, tp_med)),
                           ("stage2", (t2_min, t2_med)),
                           ("full", (tf_min, tf_med)),
                           ("brent", (tb_min, tb_med))]:
        print(f"[prof] {name:7s} min {mn*1e3:8.2f} ms  med {md*1e3:8.2f} ms  "
              f"({B/mn:８.0f} reads/s at min)".replace("８", ""),
              file=sys.stderr)


if __name__ == "__main__":
    main()
