"""Stage-level profile of the event-probe (many-genome) dist path.

Times, on the live backend: probe-only, probe+stage2, and the full fused
dist step (compact fetch) over the bench '1k' index, to locate where the
1k-genome throughput goes.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from krepp_tpu import configure

configure()

name = sys.argv[1] if len(sys.argv) > 1 else "1k"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

engine = bench.load_engine(name)
codes = bench.world_reads(name, B)
lengths = np.full(B, 150, np.int32)
leaf_ok = np.ones(engine.S, bool)

from krepp_tpu.core import codec

packed, vbits = codec.pack_codes_host(codes, lengths)
packed = jnp.asarray(packed)
vbits = None if vbits is None else jnp.asarray(vbits)
lengths_d = jnp.asarray(lengths)
leaf_ok_d = jnp.asarray(leaf_ok)
tables = engine._tables


def timeit(label, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label:28s} {best * 1e3:9.1f} ms  -> {B / best:9.0f} reads/s")
    return out


@jax.jit
def probe_only(tables, packed, vbits, lengths):
    L = packed.shape[1] * 16
    codes = codec.unpack_codes(packed, lengths, L, vbits)
    return engine._probe_impl(tables, codes, lengths)


@jax.jit
def probe_stage2(tables, packed, vbits, lengths, leaf_ok):
    L = packed.shape[1] * 16
    codes = codec.unpack_codes(packed, lengths, L, vbits)
    po = engine._probe_impl(tables, codes, lengths)
    return engine._stage2_impl(*po[:5], leaf_ok)


if engine.mode == "event":
    from krepp_tpu.query.event_probe import event_probe

    E, KH, CAP_L = engine._event_caps(B, 150 - engine.lsh.k + 1, 0)
    print(f"caps: E={E} KH={KH} CAP_L={CAP_L} max_bucket={engine.di.max_bucket}")

    @jax.jit
    def probe_light(tables, packed, vbits, lengths):
        """Event probe with the heavy-tail loop disabled (C0-only)."""
        slots_d, enc_se, row_start, row_ids, leaf_off, leaf_slots = tables
        L = packed.shape[1] * 16
        codes = codec.unpack_codes(packed, lengths, L, vbits)
        rix2, res2, valid, onmers = engine._strand_hashes(codes, lengths)
        urow, resident = engine._urow(rix2, valid[None])
        sidx, hrow, resident = engine._route_rows(row_ids, urow, resident)
        return event_probe(slots_d, enc_se, row_start, leaf_off, leaf_slots,
                           sidx, hrow, resident, res2, engine.th, engine.C0,
                           engine.S, engine.C0, E, KH, CAP_L)

    timeit("probe light-only", lambda: probe_light(
        tables, packed, vbits, lengths_d))

timeit("probe only", lambda: probe_only(tables, packed, vbits, lengths_d))
timeit("probe + stage2", lambda: probe_stage2(
    tables, packed, vbits, lengths_d, leaf_ok_d))
full = engine._get_full_jit("dist")
timeit("full fused dist step", lambda: full(
    tables, packed, vbits, lengths_d, leaf_ok_d))
