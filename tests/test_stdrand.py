"""Bit-exactness of core/stdrand vs the C++ standard library.

Golden vectors below were produced by compiling a C++ mirror of
LSHF::get_random_positions (ref: src/lshf.cpp:126-147) with the g++ in this
image; a live cross-check re-runs it when g++ is available.
"""

import shutil
import subprocess
import tempfile

import pytest

from krepp_tpu.core.stdrand import (MT19937, reference_lsh_positions,
                                    uniform_int_u32)

GOLDEN = {
    # (k, h, seed or None for default-constructed mt19937) -> ppos ascending
    (29, 13, None): [2, 3, 4, 5, 6, 8, 15, 18, 23, 24, 26, 27, 28],
    (29, 13, 0): [1, 7, 8, 11, 12, 13, 15, 17, 18, 20, 24, 25, 27],
    (29, 13, 42): [1, 2, 4, 5, 10, 12, 13, 17, 21, 22, 23, 25, 27],
    (27, 11, 0): [1, 8, 10, 11, 14, 16, 17, 19, 22, 23, 24],
    (27, 11, 7): [2, 6, 7, 8, 11, 12, 13, 14, 19, 21, 26],
    (31, 15, 123): [1, 4, 7, 8, 10, 12, 13, 14, 15, 17, 19, 21, 22, 24, 30],
    (19, 3, 1): [7, 13, 18],
    (26, 10, None): [2, 3, 5, 7, 8, 14, 16, 21, 23, 25],
    (26, 10, 2026): [0, 2, 5, 10, 12, 16, 18, 19, 24, 25],
}

ORACLE_CPP = r"""
#include <random>
#include <vector>
#include <algorithm>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
int main(int argc, char** argv) {
  unsigned k = atoi(argv[1]), h = atoi(argv[2]);
  std::mt19937 gen;
  if (argc > 3) gen.seed(atoi(argv[3]));
  std::uniform_int_distribution<uint8_t> distrib(0, k - 1);
  std::vector<uint8_t> ppos;
  while (ppos.size() < h) {
    uint8_t n = distrib(gen);
    if (!std::count(ppos.begin(), ppos.end(), n)) ppos.push_back(n);
  }
  std::sort(ppos.begin(), ppos.end());
  for (auto p : ppos) printf("%u ", p);
  return 0;
}
"""


def test_mt19937_standard_constant():
    # C++11 [rand.predef]: the 10000th consecutive invocation of a
    # default-constructed std::mt19937 produces 4123659995.
    gen = MT19937()
    for _ in range(9999):
        gen()
    assert gen() == 4123659995


def test_mt19937_reseed():
    g1, g2 = MT19937(), MT19937()
    g2.seed(5489)
    assert [g1() for _ in range(10)] == [g2() for _ in range(10)]


def test_uniform_full_range_passthrough():
    g1, g2 = MT19937(7), MT19937(7)
    for _ in range(5):
        assert uniform_int_u32(g1, 0, 0xFFFFFFFF) == g2()


@pytest.mark.parametrize("case", sorted(GOLDEN, key=str))
def test_positions_match_golden(case):
    k, h, seed = case
    ppos, npos = reference_lsh_positions(k, h, seed)
    assert list(ppos) == GOLDEN[case]
    assert sorted(set(ppos) | set(npos)) == list(range(k))


@pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")
def test_positions_match_live_cxx_oracle(tmp_path):
    src = tmp_path / "gen.cpp"
    src.write_text(ORACLE_CPP)
    exe = tmp_path / "gen"
    subprocess.run(["g++", "-O1", "-o", str(exe), str(src)], check=True)
    for (k, h, seed) in [(29, 13, None), (23, 5, 31337), (30, 14, 99),
                         (20, 4, 0), (31, 15, None)]:
        argv = [str(exe), str(k), str(h)] + ([] if seed is None else [str(seed)])
        out = subprocess.run(argv, capture_output=True, text=True, check=True)
        want = [int(x) for x in out.stdout.split()]
        got, _ = reference_lsh_positions(k, h, seed)
        assert list(got) == want, (k, h, seed)
