"""Mesh-data-parallel index build vs the sequential build: bit-identical."""

import numpy as np
import jax

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.index.build import build_index
from krepp_tpu.parallel.build import build_index_sharded

import worldgen

from test_e2e_dist import write_world


def _world(tmp_path, seed=41, nleaves=7, glen=2200):
    rng = np.random.default_rng(seed)
    nwk, genomes = worldgen.make_world(rng, nleaves=nleaves, glen=glen,
                                       rate=0.05)
    input_map = write_world(tmp_path, genomes)
    from krepp_tpu.tree.newick import Tree

    return input_map, Tree.parse(nwk)


def test_sharded_build_bit_identical(tmp_path):
    assert len(jax.devices()) >= 8
    input_map, tree = _world(tmp_path)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 4, seed=5),
                         w=35, r=1, frac=True)
    b0 = build_index(input_map, params, tree, progress=False)
    b1 = build_index_sharded(input_map, params, tree,
                             devices=jax.devices()[:8], progress=False)
    assert np.array_equal(b0.enc_v, b1.enc_v)
    assert np.array_equal(b0.se_v, b1.se_v)
    assert np.array_equal(b0.inc, b1.inc)
    assert np.array_equal(b0.colors.leaf_off, b1.colors.leaf_off)
    assert np.array_equal(b0.colors.leaf_list, b1.colors.leaf_list)
    # HLL register maxima are identical across winnowers -> exact rho match
    assert np.array_equal(b0.colors.rho, b1.colors.rho)


def test_sharded_build_multicontig(tmp_path):
    """Multiple contigs per genome + a contig shorter than w (skipped)."""
    rng = np.random.default_rng(17)
    nwk, genomes = worldgen.make_world(rng, nleaves=4, glen=1800, rate=0.05)
    # split each genome into 3 contigs, one of which is sub-w
    refs = tmp_path / "refs"
    refs.mkdir()
    input_map = []
    for name, seqs in sorted(genomes.items()):
        seq = seqs[0]
        p = refs / f"{name}.fna"
        with open(p, "w") as f:
            f.write(f">{name}-a\n{seq[:900]}\n")
            f.write(f">{name}-tiny\n{seq[900:920]}\n")
            f.write(f">{name}-b\n{seq[920:]}\n")
        input_map.append((name, str(p)))
    from krepp_tpu.tree.newick import Tree

    tree = Tree.parse(nwk)
    params = IndexParams(lsh=LSHParams.generate(23, 9, 2, seed=2),
                         w=31, r=0, frac=True)
    b0 = build_index(input_map, params, tree, progress=False)
    b1 = build_index_sharded(input_map, params, tree,
                             devices=jax.devices()[:4], progress=False)
    assert np.array_equal(b0.enc_v, b1.enc_v)
    assert np.array_equal(b0.se_v, b1.se_v)
    assert np.array_equal(b0.inc, b1.inc)
    assert np.array_equal(b0.colors.rho, b1.colors.rho)
