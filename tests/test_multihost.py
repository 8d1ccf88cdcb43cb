"""Two-process multi-host smoke test: the sharded query step over a global
mesh spanning processes (CPU devices + Gloo collectives) must match the
single-process engine exactly. SURVEY §5.8's multi-host code path."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]; outp = sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from krepp_tpu.parallel.boot import init_distributed
init_distributed(f"localhost:{port}", 2, pid)
from krepp_tpu.parallel.multihost import MultiHostQueryEngine
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
from krepp_tpu.parallel.mesh import make_query_mesh
from krepp_tpu.index.index import DeviceIndex
from krepp_tpu.testing import build_world_index, sample_read_codes
built, genomes, tree = build_world_index(seed=21, nleaves=6, glen=1200, m=2)
di = DeviceIndex.from_built(built)
rng = np.random.default_rng(22)
codes = sample_read_codes(rng, genomes, 8, rlen=150, mut=0.05)
lengths = np.full(8, 150, np.int32)
mesh = make_query_mesh(2, 2)
eng = MultiHostQueryEngine(di, mesh, 4)
lr = eng.run_leaf_stage(codes, lengths)
np.savez(outp, present=lr.present, hist=lr.hist, d=lr.d,
         slot=lr.closest_slot, onmers=lr.onmers)
print("child", pid, "ok", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_query(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count
    # JAX_PLATFORMS must NOT be exported: the image's sitecustomize would
    # then initialise the XLA backend before jax.distributed.initialize
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    outs = [str(tmp_path / f"out{p}.npz") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(p), str(port), outs[p]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for p in range(2)]
    for p, proc in enumerate(procs):
        try:
            so, se = proc.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert proc.returncode == 0, f"child {p} failed:\n{se[-3000:]}"

    # ground truth: plain single-process engine on the same world
    from krepp_tpu.index.index import DeviceIndex
    from krepp_tpu.query.engine import QueryEngine
    from krepp_tpu.testing import build_world_index, sample_read_codes

    built, genomes, tree = build_world_index(seed=21, nleaves=6, glen=1200,
                                             m=2)
    di = DeviceIndex.from_built(built)
    rng = np.random.default_rng(22)
    codes = sample_read_codes(rng, genomes, 8, rlen=150, mut=0.05)
    lengths = np.full(8, 150, np.int32)
    lr0 = QueryEngine(di, 4).run_leaf_stage(codes, lengths)

    for p in range(2):
        z = np.load(outs[p])
        assert np.array_equal(z["present"], lr0.present), f"proc {p}"
        assert np.array_equal(z["hist"], lr0.hist), f"proc {p}"
        assert np.array_equal(z["slot"], lr0.closest_slot), f"proc {p}"
        assert np.array_equal(z["onmers"], lr0.onmers), f"proc {p}"
        assert np.allclose(z["d"][lr0.present], lr0.d[lr0.present],
                           rtol=1e-9, atol=1e-11), f"proc {p}"
