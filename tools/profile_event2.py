"""Event-probe stage timings with forced-fetch measurement (round 4)."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from krepp_tpu import configure

    configure()
    import jax
    import jax.numpy as jnp

    import bench
    from krepp_tpu.core import codec

    engine = bench.load_engine("1k")
    assert engine.mode == "event"
    B = 8192
    codes = bench.world_reads("1k", B)
    lengths = np.full(B, 150, np.int32)
    packed, vbits = codec.pack_codes_host(codes, lengths)
    packed_d = jax.device_put(jnp.asarray(packed))
    lengths_d = jax.device_put(jnp.asarray(lengths))
    leaf_ok_d = jax.device_put(jnp.asarray(np.ones(engine.S, bool)))
    tables = engine._tables

    def timeit(label, fn, *args, reps=3):
        t0 = time.time()
        out = fn(*args)
        x = out[0] if isinstance(out, (tuple, list)) else out
        jax.device_get(x.ravel()[0])
        print(f"[ev] {label}: first {time.time()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            x = out[0] if isinstance(out, (tuple, list)) else out
            jax.device_get(x.ravel()[0])
            ts.append(time.time() - t0)
        ts.sort()
        print(f"[ev] {label}: {ts[len(ts)//2]*1e3:9.2f} ms", flush=True)

    # full fused
    fused = engine._get_full_jit("dist")
    timeit("fused dist", fused, tables, packed_d, None, lengths_d, leaf_ok_d)

    # probe only
    probe = jax.jit(functools.partial(engine._probe_impl))
    codes_d = jax.jit(lambda p, l: codec.unpack_codes(
        p, l, p.shape[1] * 16, None))(packed_d, lengths_d)
    jax.device_get(codes_d.ravel()[0])
    timeit("probe (event) only", probe, tables, codes_d, lengths_d)

    # pieces inside event_probe: replicate the calls
    from krepp_tpu.query import event_probe as ep

    slots_d, enc_se, row_start, row_ids, leaf_off, leaf_slots = tables
    pre = jax.jit(lambda c, l: engine._strand_hashes(c, l))
    rix2, res2, valid, onmers = pre(codes_d, lengths_d)
    urow_f = jax.jit(lambda r, v: engine._urow(r, v[None]))
    urow, resident = urow_f(rix2, valid)
    jax.device_get(urow.ravel()[0])
    P = int(urow.shape[2])
    E, KH, CAP_L = engine._event_caps(B, P, 0)
    print(f"[ev] P={P} E={E} KH={KH} CAP_L={CAP_L} max_bucket="
          f"{engine.di.max_bucket}", flush=True)

    # NOTE: index arrays must be jit ARGUMENTS — closed-over constants get
    # serialized into the remote compile payload (engine.py docstring)
    ev_fn = jax.jit(functools.partial(
        ep.event_probe, th=engine.th, C0=engine.C0, S=engine.S,
        max_bucket=engine.di.max_bucket, E=E, KH=KH, CAP_L=CAP_L))
    timeit("event_probe full", ev_fn, slots_d, enc_se, row_start, leaf_off,
           leaf_slots, urow, urow, resident, res2)

    @jax.jit
    def light_only(slots_d, urow, resident, res2):
        d = slots_d[urow]
        cnt = jnp.where(resident, d[..., 0].astype(jnp.int32), 0)
        enc = d[..., 1: 1 + engine.C0]
        hd = codec.hdist_lr32(enc, res2[..., None])
        return jnp.sum(hd, dtype=jnp.int32) + jnp.sum(cnt)

    timeit("light slots gather+hd", light_only, slots_d, urow, resident,
           res2)

    # stage 2 on probe outputs
    pout = probe(tables, codes_d, lengths_d)
    jax.device_get(pout[4].ravel()[0])
    s2 = jax.jit(lambda *a: engine._stage2_lanes(
        *a, leaf_ok_d, max(8 * B, 4096))["d_f"])
    timeit("stage2 lanes only", s2, *pout[:5])


if __name__ == "__main__":
    main()
