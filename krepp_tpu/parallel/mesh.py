"""Multi-chip sharded querying: LSH-row-sharded index + data-parallel reads.

The reference is single-process OpenMP (ref: src/krepp.cpp:356-394); the
TPU-native scale-out shards the flat CSR by unified-row blocks across the
`shard` mesh axis (each probe's bucket lives entirely on one shard, so
per-shard first-match histograms sum exactly) and shards read batches over
the `data` axis. Collectives: psum of histogram partials and pmin of the
global min-distance over `shard` — all riding ICI under one jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import codec
from ..index.index import DeviceIndex
from ..query.engine import QueryEngine
from ..query.bucket_scan import probe_strand, probe_strand_full


def make_query_mesh(n_data: int, n_shard: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_shard
    return Mesh(devices[: n_data * n_shard].reshape(n_data, n_shard),
                ("data", "shard"))


class ShardedQueryEngine(QueryEngine):
    """QueryEngine whose stage-1 probe runs under shard_map on a mesh.

    Index rows are block-sharded over `shard`; reads over `data`; stage 2
    runs on the replicated (psum-merged) histograms.
    """

    def __init__(self, dindex: DeviceIndex, mesh: Mesh, hdist_th: int = 4):
        self.mesh = mesh
        self.n_shard = mesh.shape["shard"]
        self.n_data = mesh.shape["data"]
        self._build_shards(dindex)
        super().__init__(dindex, hdist_th)
        self._probe_jit = jax.jit(self._sharded_probe)

    def _init_tables(self, dindex: DeviceIndex) -> None:
        """The probe reads the shard-placed arrays; no single-device table."""
        self.mode = "sharded"
        self._tables = ()
        self._mask = jnp.asarray(dindex.se_mask)

    def _build_shards(self, di: DeviceIndex) -> None:
        if di.row_ids is not None:
            raise NotImplementedError(
                "sharded querying over sparse-row indexes (h >= 13 row "
                "spaces) is not supported yet; use the single-device engine")
        D = self.n_shard
        self.rows_per_shard = rps = (di.nrows_u + D - 1) // D
        starts = di.row_start
        # per-shard entry slices, padded to a common length
        bounds = [(int(starts[min(s * rps, di.nrows_u)]),
                   int(starts[min((s + 1) * rps, di.nrows_u)]))
                  for s in range(D)]
        maxlen = max(1, max(e - b for b, e in bounds))
        enc_sh = np.zeros((D, maxlen), np.uint32)
        se_sh = np.zeros((D, maxlen), np.int32)
        row_sh = np.zeros((D, rps + 1), np.int64)
        for s, (b, e) in enumerate(bounds):
            enc_sh[s, : e - b] = di.enc_v[b:e]
            se_sh[s, : e - b] = di.se_v[b:e]
            lo = min(s * rps, di.nrows_u)
            hi = min((s + 1) * rps, di.nrows_u)
            seg = starts[lo: hi + 1] - b
            row_sh[s, : hi - lo + 1] = seg
            row_sh[s, hi - lo + 1:] = seg[-1] if len(seg) else 0
        self._enc_shards = enc_sh
        self._se_shards = se_sh
        self._rowstart_shards = row_sh.astype(np.int32)
        sh = NamedSharding(self.mesh, P("shard", None))
        sh3 = NamedSharding(self.mesh, P("shard", None, None))
        enc_se = np.stack([enc_sh, se_sh.astype(np.uint32)], axis=2)
        self._enc_se_dev = jax.device_put(enc_se, sh3)
        self._rowstart_dev = jax.device_put(self._rowstart_shards, sh)

    def _shard_probe_one(self, rix, res, valid, enc_se_s, rowstart_s,
                         shard_id, exact):
        """Bucket scan against this shard's rows only."""
        m = self.lsh.m
        R = self.di.R
        rps = self.rows_per_shard
        resident, rank = self._residue_maps(rix)
        resident = resident & valid
        urow = (rix // jnp.uint32(m)).astype(jnp.int32) * R + rank
        mine = resident & (urow >= shard_id * rps) & (urow < (shard_id + 1) * rps)
        lrow = jnp.where(mine, urow - shard_id * rps, 0)
        start = rowstart_s[lrow]
        cnt = jnp.where(mine, rowstart_s[lrow + 1] - start, 0)
        if exact:
            h, mn = probe_strand_full(enc_se_s, self._mask, self._expand,
                                      start, cnt, res, self.th, self.W,
                                      self.S, self.di.max_bucket)
            return h, mn, jnp.bool_(False)
        return probe_strand(enc_se_s, self._mask, self._expand, start, cnt,
                            res, self.th, self.W, self.S, self.di.max_bucket)

    def _probe_dispatch(self, tables, codes, lengths, exact: bool = False):
        del tables  # shard-placed arrays are used instead
        return self._sharded_probe(codes, lengths, exact)

    def _sharded_probe(self, codes, lengths, exact: bool = False):
        lsh = self.lsh
        k = lsh.k
        mesh = self.mesh

        def step(codes_l, lengths_l, enc_se_s, rowstart_s):
            shard_id = jax.lax.axis_index("shard")
            B, L = codes_l.shape
            Pn = L - k + 1
            t_idx = jnp.arange(Pn, dtype=jnp.int32)
            rix_or, rix_rc, res_or, res_rc, valid_w = \
                codec.strand_hashes_conv(codes_l, lsh)
            valid = valid_w & (t_idx[None, :] <= lengths_l[:, None] - k)
            onmers = jnp.sum(valid, axis=1, dtype=jnp.int32)
            outs = []
            ov = jnp.bool_(False)
            for rix, res in ((rix_or, res_or), (rix_rc, res_rc)):
                hist, minall, o = self._shard_probe_one(
                    rix, res, valid, enc_se_s[0], rowstart_s[0], shard_id,
                    exact)
                # exact cross-shard merge: buckets are row-disjoint
                hist = jax.lax.psum(hist, "shard")
                minall = jax.lax.pmin(minall, "shard")
                ov = ov | (jax.lax.pmax(o.astype(jnp.int32), "shard") > 0)
                outs.append((hist, minall))
            (hist_or, minall_or), (hist_rc, minall_rc) = outs
            ov_b = jnp.broadcast_to(ov, onmers.shape)
            return hist_or, hist_rc, minall_or, minall_rc, onmers, ov_b

        fn = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P("data", None), P("data"), P("shard", None, None),
                      P("shard", None)),
            out_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                       P("data")),
            check_vma=False)
        return fn(codes, lengths, self._enc_se_dev, self._rowstart_dev)

    def run_leaf_stage(self, codes: np.ndarray, lengths: np.ndarray,
                       leaf_ok: Optional[np.ndarray] = None):
        # pad batch to a multiple of the data axis
        B = codes.shape[0]
        Bp = ((B + self.n_data - 1) // self.n_data) * self.n_data
        if Bp != B:
            codes = np.concatenate(
                [codes, np.full((Bp - B, codes.shape[1]), 4, codes.dtype)])
            lengths = np.concatenate([lengths, np.zeros(Bp - B, lengths.dtype)])
        out = super().run_leaf_stage(codes, lengths, leaf_ok)
        if Bp != B:
            import dataclasses

            out = dataclasses.replace(
                out, **{f.name: getattr(out, f.name)[:B]
                        for f in dataclasses.fields(out)
                        if getattr(out, f.name).shape[:1] == (Bp,)})
        return out
