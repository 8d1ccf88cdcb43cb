"""TPU vs CPU exactness check for the fused dist step.

The engine's integer paths must produce IDENTICAL results on the TPU
backend (bf16 MXU hash conv, Pallas packed epilogue) and the CPU backend
(XLA reference formulation). Distances are f64-emulated on TPU and must
agree to the reference print precision (and in practice bit-for-bit).

Run: python -u tools/tpu_parity_check.py
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CPU_CHILD = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from krepp_tpu import configure; configure()
sys.path.insert(0, os.path.dirname(os.path.abspath({root!r})))
sys.path.insert(0, {root!r})
import bench
from krepp_tpu.query.engine import QueryEngine
engine = bench.load_engine("base")
codes = bench.world_reads("base", 512)
lengths = np.full(512, 150, np.int32)
lr = engine.run_leaf_stage(codes, lengths)
np.savez({out!r}, present=lr.present, d=lr.d, slot=lr.closest_slot,
         hist=lr.hist, onmers=lr.onmers)
print("cpu done", flush=True)
"""


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outp = "/tmp/parity_cpu.npz"
    code = _CPU_CHILD.format(root=repr(root), out=repr(outp))
    # format with repr placeholders
    code = _CPU_CHILD.replace("{root!r}", repr(root)).replace(
        "{out!r}", repr(outp))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=root,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    print(r.stdout.strip(), flush=True)

    from krepp_tpu import configure

    configure()
    import bench
    from krepp_tpu.query.engine import QueryEngine

    engine = bench.load_engine("base")
    codes = bench.world_reads("base", 512)
    lengths = np.full(512, 150, np.int32)
    lr = engine.run_leaf_stage(codes, lengths)
    z = np.load(outp)
    ok = True
    for name, a in (("present", lr.present), ("hist", lr.hist),
                    ("slot", lr.closest_slot), ("onmers", lr.onmers)):
        same = np.array_equal(np.asarray(a), z[name])
        print(f"{name}: {'EQUAL' if same else 'MISMATCH'}", flush=True)
        ok &= same
    pres = z["present"]
    dd = np.abs(np.asarray(lr.d)[pres] - z["d"][pres])
    print(f"d: max abs diff on present lanes = {dd.max():.3e}", flush=True)
    ok &= bool(dd.max() < 5e-10)
    print("PARITY OK" if ok else "PARITY FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
