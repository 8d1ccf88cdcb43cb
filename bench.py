"""Benchmark: dist reads/s on the current JAX backend (TPU under the driver).

Builds a synthetic 12-genome index in memory, streams mutated 150 bp read
batches through the full dist leaf stage (probe + histogram + batched Brent
ML), and prints ONE JSON line:

  {"metric": "dist_reads_per_s", "value": N, "unit": "reads/s",
   "vs_baseline": R}

vs_baseline = TPU reads/s over the same engine run on one CPU host process
(the reference binary cannot be compiled in this image — its submodules and
toy genomes are stripped — so the CPU run of this engine is the stand-in;
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def fast_reads(rng, genomes, n, rlen=150, mut=0.05):
    from krepp_tpu.testing import sample_read_codes

    return sample_read_codes(rng, genomes, n, rlen=rlen, mut=mut)


def ensure_index(cache: str, seed: int, nleaves: int, glen: int) -> None:
    """Build the bench index in a CPU-backend subprocess.

    The dist throughput being measured never includes the build; building in
    a CPU subprocess keeps the (cold, minutes-long) TPU compile of the
    winnowing program out of the bench entirely.
    """
    if os.path.exists(os.path.join(cache, "meta.json")):
        return
    code = (
        "from krepp_tpu import configure; configure()\n"
        "from krepp_tpu.testing import build_world_index\n"
        "from krepp_tpu.index import artifact\n"
        f"built, _, _ = build_world_index(seed={seed}, nleaves={nleaves}, "
        f"glen={glen}, rate=0.05)\n"
        f"artifact.save_native(built, {cache!r})\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    t0 = time.time()
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.abspath(__file__)))
    print(f"[bench] index built (cpu subprocess) in {time.time() - t0:.1f}s",
          file=sys.stderr)


def run_bench(n_batches: int, batch: int = 16384, seed: int = 7,
              nleaves: int = 24, glen: int = 500_000):
    import jax

    from krepp_tpu import configure

    configure()
    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.engine import QueryEngine

    from krepp_tpu.index import artifact
    from krepp_tpu.testing import make_world_codes

    cache = os.path.expanduser(
        f"~/.cache/krepp_tpu_bench/idx-{seed}-{nleaves}-{glen}")
    ensure_index(cache, seed, nleaves, glen)
    t0 = time.time()
    built = artifact.load_native(cache)
    rng0 = np.random.default_rng(seed)
    _nwk, genomes = make_world_codes(rng0, nleaves=nleaves, glen=glen,
                                     rate=0.05)
    print(f"[bench] index loaded in {time.time() - t0:.1f}s "
          f"({built.nkmers} k-mers)", file=sys.stderr)
    di = DeviceIndex.from_built(built)
    engine = QueryEngine(di, hdist_th=4)

    rng = np.random.default_rng(seed + 1)
    rlen = 150
    codes = fast_reads(rng, genomes, batch * (n_batches + 2), rlen=rlen)
    lengths = np.full(batch, rlen, np.int32)
    batches = [codes[i * batch:(i + 1) * batch] for i in range(n_batches + 2)]

    # warmup / compile
    def one(batch):
        return engine.fetch_leaf_stage(
            engine.run_leaf_stage_async(batch, lengths, out_mode="dist"),
            lengths, out_mode="dist")

    lr = one(batches[0])
    lr = one(batches[1])
    print(f"[bench] warmup done; present frac "
          f"{lr.present.any(axis=1).mean():.2f}", file=sys.stderr)

    # measure the pipelined path (3 batches in flight, like the drivers);
    # the shared TPU pool is contended, so also report per-window numbers
    from collections import deque

    leaf_ok = np.ones(engine.S, bool)
    t0 = time.time()
    pending = deque()
    for i in range(2, n_batches + 2):
        pending.append(engine.run_leaf_stage_async(batches[i], lengths,
                                                   leaf_ok, out_mode="dist"))
        if len(pending) >= 3:
            engine.fetch_leaf_stage(pending.popleft(), lengths,
                                    out_mode="dist")
    while pending:
        engine.fetch_leaf_stage(pending.popleft(), lengths, out_mode="dist")
    elapsed = time.time() - t0
    reads_per_s = batch * n_batches / elapsed
    print(f"[bench] {batch * n_batches} reads in {elapsed:.2f}s pipelined -> "
          f"{reads_per_s:.0f} reads/s on {jax.devices()[0]}", file=sys.stderr)
    return reads_per_s


def main():
    if "--cpu-baseline" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        v = run_bench(n_batches=4, batch=2048)
        print(json.dumps({"cpu_reads_per_s": v}))
        return

    value = run_bench(n_batches=8)

    vs_baseline = 1.0
    try:
        env = dict(os.environ)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                cpu_v = json.loads(line)["cpu_reads_per_s"]
                vs_baseline = value / cpu_v
                print(f"[bench] cpu baseline {cpu_v:.0f} reads/s -> "
                      f"speedup {vs_baseline:.2f}x", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)

    print(json.dumps({"metric": "dist_reads_per_s", "value": round(value, 1),
                      "unit": "reads/s", "vs_baseline": round(vs_baseline, 3)}))


if __name__ == "__main__":
    main()
