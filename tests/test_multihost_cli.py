"""Two-process multi-host CLI test: `krepp-tpu place --mesh 2x2` across two
CPU processes (Gloo) with per-rank output slicing must reproduce the
single-process output exactly. SURVEY §5.8 / the env-var-triggered
jax.distributed bootstrap in cli.main."""

import os
import socket
import subprocess
import sys

import numpy as np

_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
idx_dir = sys.argv[3]; qpath = sys.argv[4]; outp = sys.argv[5]
cmd = sys.argv[6]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["KREPP_COORDINATOR"] = f"localhost:{port}"
os.environ["KREPP_NUM_PROCESSES"] = "2"
os.environ["KREPP_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
from krepp_tpu.cli import main
rc = main([cmd, "--mesh", "2x2", "--tabular", "-q", qpath, "-i", idx_dir,
           "-o", outp] if cmd == "place"
          else [cmd, "--mesh", "2x2", "-q", qpath, "-i", idx_dir,
                "-o", outp])
print("child", pid, "rc", rc, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _world(tmp_path):
    from krepp_tpu.index import artifact
    from krepp_tpu.testing import build_world_index, sample_read_codes

    built, genomes, tree = build_world_index(seed=31, nleaves=6, glen=1500,
                                             m=2)
    idx_dir = str(tmp_path / "idx")
    artifact.save_native(built, idx_dir)
    rng = np.random.default_rng(32)
    codes = sample_read_codes(rng, genomes, 9, rlen=150, mut=0.05)
    qpath = str(tmp_path / "q.fq")
    with open(qpath, "w") as f:
        for i, c in enumerate(codes):
            seq = "".join("ACGTN"[b] for b in c)
            f.write(f"@read{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    return idx_dir, qpath


def _run_two_process(tmp_path, idx_dir, qpath, cmd):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    outp = str(tmp_path / f"{cmd}_out.tsv")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(p), str(port), idx_dir, qpath,
         outp, cmd],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for p in range(2)]
    for p, proc in enumerate(procs):
        try:
            _so, se = proc.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert proc.returncode == 0, f"child {p} failed:\n{se[-3000:]}"
    parts = []
    for p in range(2):
        with open(f"{outp}.rank{p}") as f:
            parts.append(f.read())
    return parts


def test_two_process_place_cli(tmp_path):
    import io

    from krepp_tpu.cli import main as cli_main

    idx_dir, qpath = _world(tmp_path)
    single = str(tmp_path / "single.tsv")
    cli_main(["place", "--tabular", "-q", qpath, "-i", idx_dir,
              "-o", single])
    want = open(single).read().splitlines()
    parts = _run_two_process(tmp_path, idx_dir, qpath, "place")
    got_rows = []
    header = []
    for p, text in enumerate(parts):
        lines = text.splitlines()
        # every rank writes the full header; data rows are its read slice
        hdr = [ln for ln in lines if ln.startswith("#") or
               ln.startswith("SEQ_ID")]
        header = hdr
        got_rows += [ln for ln in lines if ln and ln not in hdr]
    want_hdr = [ln for ln in want if ln.startswith("#")
                or ln.startswith("SEQ_ID")]
    want_rows = [ln for ln in want if ln and ln not in want_hdr]
    assert sorted(got_rows) == sorted(want_rows)
    assert len(header) == len(want_hdr)


def test_two_process_dist_cli(tmp_path):
    from krepp_tpu.cli import main as cli_main

    idx_dir, qpath = _world(tmp_path)
    single = str(tmp_path / "single_d.tsv")
    cli_main(["dist", "-q", qpath, "-i", idx_dir, "-o", single])
    want = [ln for ln in open(single).read().splitlines()
            if ln and not ln.startswith(("#", "SEQ_ID"))]
    parts = _run_two_process(tmp_path, idx_dir, qpath, "dist")
    got = []
    for text in parts:
        got += [ln for ln in text.splitlines()
                if ln and not ln.startswith(("#", "SEQ_ID"))]
    assert sorted(got) == sorted(want)
