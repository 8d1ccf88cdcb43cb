"""Native C reader vs the Python reader."""

import gzip

import numpy as np
import pytest

from krepp_tpu.io import fastx, native
from krepp_tpu.core.codec import seq_to_codes


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nio")
    rng = np.random.default_rng(0)
    recs = []
    for i in range(50):
        n = int(rng.integers(50, 3000))
        seq = "".join(rng.choice(list("ACGTN"), size=n,
                                 p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        recs.append((f"rec{i}|x-{i}", seq))
    fa = tmp / "multi.fna"
    with open(fa, "w") as f:
        for name, seq in recs:
            f.write(f">{name} some description\n")
            for j in range(0, len(seq), 70):
                f.write(seq[j: j + 70] + "\n")
    fq = tmp / "reads.fq"
    with open(fq, "w") as f:
        for name, seq in recs:
            f.write(f"@{name} desc\n{seq}\n+\n{'I' * len(seq)}\n")
    fagz = tmp / "multi.fna.gz"
    with gzip.open(fagz, "wt") as f:
        for name, seq in recs:
            f.write(f">{name}\n{seq}\n")
    return recs, str(fa), str(fq), str(fagz)


@pytest.mark.skipif(not native.native_available(), reason="no C compiler")
@pytest.mark.parametrize("which", ["fa", "fq", "fagz"])
def test_native_matches_python(files, which):
    recs, fa, fq, fagz = files
    path = {"fa": fa, "fq": fq, "fagz": fagz}[which]
    py = [(n, seq_to_codes(s)) for n, s in fastx.read_fastx(path)]
    nat = list(native.read_fastx_native(path))
    assert len(py) == len(nat)
    for (pn, pc), (nn, nc) in zip(py, nat):
        assert pn == nn
        assert np.array_equal(pc, nc), pn


@pytest.mark.skipif(not native.native_available(), reason="no C compiler")
def test_native_chunk_boundaries(files):
    recs, fa, fq, fagz = files
    # tiny chunks force many boundary crossings
    out = []
    for names, arena, off in native.NativeFastxReader(fq, max_records=7,
                                                      max_bases=4000):
        for i, nm in enumerate(names):
            out.append((nm, arena[off[i]: off[i + 1]]))
    assert len(out) == len(recs)
    for (nm, codes), (rn, rs) in zip(out, recs):
        assert nm == rn.split()[0] if " " in rn else rn
        assert np.array_equal(codes, seq_to_codes(rs))
