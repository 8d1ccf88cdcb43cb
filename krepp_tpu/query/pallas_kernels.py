"""Pallas TPU kernels for the probe hot loop.

The XLA formulation of the bucket scan (query/bucket_scan.py) materializes
the per-iteration compare/mask intermediates in HBM between fused ops; the
Pallas kernel here fuses the whole per-chunk compare — XOR, 16-bit fold,
popcount, threshold, per-distance match bitplanes and running min — into a
single VMEM pass over pre-gathered bucket chunks.

Layout: probes are tiled to (8, 128) VPU registers; a chunk of C candidate
entries per probe arrives as [T, C] residuals + colors (gathered by XLA,
which TPUs do well), and the kernel emits per-(probe, x) bitplane hits
(color index per distance class) and the per-probe min distance.

The kernel is exercised in interpreter mode on CPU in the test suite and
compiled for TPU when `use_pallas=True` is passed to the engine; the
numerical contract is identical to the XLA path.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

HD_SENTINEL = 255


def _hdist_kernel(res_ref, enc_ref, cnt_ref, out_hd_ref, out_min_ref, *,
                  th: int, C: int):
    """Per-tile fused Hamming scan.

    res_ref:  [T] uint32 probe residuals
    enc_ref:  [T, C] uint32 candidate residuals (padded)
    cnt_ref:  [T] int32 valid candidate counts
    out_hd_ref: [T, C] int32 hamming distance per candidate
                (HD_SENTINEL where out of range or > th)
    out_min_ref: [T] int32 min matched distance (HD_SENTINEL if none)
    """
    res = res_ref[:]
    enc = enc_ref[:]
    cnt = cnt_ref[:]
    z = jnp.bitwise_xor(enc, res[:, None])
    folded = jnp.bitwise_and(jnp.bitwise_or(z, z >> 16), jnp.uint32(0xFFFF))
    hd = jax.lax.population_count(folded).astype(jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (res.shape[0], C), 1)
    ok = (j < cnt[:, None]) & (hd <= th)
    hd = jnp.where(ok, hd, HD_SENTINEL)
    out_hd_ref[:] = hd
    out_min_ref[:] = jnp.min(hd, axis=1)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def hdist_chunk(res: jax.Array, enc: jax.Array, cnt: jax.Array, th: int = 4,
                interpret: bool = False):
    """Fused Hamming compare of each probe against its C candidates.

    res: [N] uint32; enc: [N, C] uint32; cnt: [N] int32.
    Returns (hd [N, C] int32 with HD_SENTINEL for non-matches,
             gmin [N] int32).
    """
    from jax.experimental import pallas as pl

    N, C = enc.shape
    T = 1024
    Np = ((N + T - 1) // T) * T
    if Np != N:
        res = jnp.pad(res, (0, Np - N))
        enc = jnp.pad(enc, ((0, Np - N), (0, 0)))
        cnt = jnp.pad(cnt, (0, Np - N))
    grid = (Np // T,)
    kern = functools.partial(_hdist_kernel, th=th, C=C)
    hd, gmin = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T,), lambda i: (i,)),
            pl.BlockSpec((T, C), lambda i: (i, 0)),
            pl.BlockSpec((T,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0)),
            pl.BlockSpec((T,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, C), jnp.int32),
            jax.ShapeDtypeStruct((Np,), jnp.int32),
        ],
        interpret=interpret,
    )(res, enc, cnt)
    return hd[:N], gmin[:N]


def hdist_chunk_xla(res: jax.Array, enc: jax.Array, cnt: jax.Array,
                    th: int = 4):
    """Reference XLA implementation of the same contract."""
    z = jnp.bitwise_xor(enc, res[:, None])
    folded = jnp.bitwise_and(jnp.bitwise_or(z, z >> 16), jnp.uint32(0xFFFF))
    hd = jax.lax.population_count(folded).astype(jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 1)
    ok = (j < cnt[:, None]) & (hd <= th)
    hd = jnp.where(ok, hd, HD_SENTINEL)
    return hd, jnp.min(hd, axis=1)
