"""Sharded (multi-device) query path vs single-device, on the virtual CPU
mesh (8 devices via --xla_force_host_platform_device_count)."""

import numpy as np
import pytest
import jax

from krepp_tpu.params import IndexParams, LSHParams
from krepp_tpu.index.build import build_index
from krepp_tpu.index.index import DeviceIndex
from krepp_tpu.query.engine import QueryEngine
from krepp_tpu.parallel.mesh import ShardedQueryEngine, make_query_mesh
from krepp_tpu.tree.newick import Tree
from krepp_tpu.core.codec import seq_to_codes, pad_codes_batch

import worldgen
from test_e2e_dist import write_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(31)
    tmp = tmp_path_factory.mktemp("sh")
    nwk, genomes = worldgen.make_world(rng, nleaves=6, glen=1500, rate=0.05)
    input_map = write_world(tmp, genomes)
    params = IndexParams(lsh=LSHParams.generate(27, 11, 4, seed=6),
                         w=35, r=1, frac=True)
    tree = Tree.parse(nwk)
    built = build_index(input_map, params, tree, progress=False)
    di = DeviceIndex.from_built(built)
    reads = worldgen.sample_reads(rng, genomes, n=11, mut=0.05)
    return di, reads


@pytest.mark.parametrize("n_data,n_shard", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_equals_single(world, n_data, n_shard):
    di, reads = world
    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices"
    mesh = make_query_mesh(n_data, n_shard)
    codes, lengths = pad_codes_batch([seq_to_codes(s) for _, s in reads])
    e0 = QueryEngine(di, 4)
    lr0 = e0.run_leaf_stage(codes, lengths)
    e1 = ShardedQueryEngine(di, mesh, 4)
    lr1 = e1.run_leaf_stage(codes, lengths)
    assert np.array_equal(lr0.present, lr1.present)
    assert np.array_equal(lr0.hist, lr1.hist)
    assert np.array_equal(lr0.closest_slot, lr1.closest_slot)
    # histograms merge exactly (integer psum over row-disjoint buckets);
    # the f64 Brent can differ at the last-ulp level across shardings due
    # to XLA vectorization choices — far below the 5-decimal output grid
    assert np.allclose(lr0.d[lr0.present], lr1.d[lr1.present],
                       rtol=1e-9, atol=1e-11)
    assert np.array_equal(lr0.onmers, lr1.onmers)
