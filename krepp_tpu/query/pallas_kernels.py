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


def _probe_hist_kernel(enc_ref, msk_ref, res_ref, resi_ref, hist_ref,
                       min_ref, *, th: int, C0: int, W: int, S: int):
    """Fused direct-probe epilogue for one tile of TB probes-rows.

    Layout puts the position axis P last (the 128-lane axis):
      enc_ref:  [TB, C0, P] u32   candidate residual encodings
      msk_ref:  [TB, W*C0, P] u32 leaf bitmask words per candidate
      res_ref:  [TB, 1, P] u32    probe residuals
      resi_ref: [TB, 1, P] i32    1 where the probe row is resident/valid
      hist_ref: [TB, S, X] i32    per-(read, leaf) first-match histogram
      min_ref:  [TB, 1, 1] i32    min matched distance over the tile row

    Everything after the XLA row-gather happens here in VMEM: XOR + 16-bit
    fold + popcount Hamming distance (ref: src/common.hpp:157-175), the
    per-distance-class leaf-bitmask OR, the first-x dedupe
    (ref: src/query.hpp:153-176) and the position reduction.
    """
    X = th + 1
    # everything int32: Mosaic's u32<->i32 conversion rule recurses, and all
    # the bit arithmetic here is sign-agnostic (the 16-bit fold masks away
    # arithmetic-shift fill; (x >> s) & 1 extracts bit s either way)
    enc = enc_ref[:]                       # [TB, C0, P] i32
    res = res_ref[:]                       # [TB, 1, P] i32
    resi = resi_ref[:] != 0                # [TB, 1, P]
    z = jnp.bitwise_xor(enc, res)
    folded = jnp.bitwise_and(jnp.bitwise_or(z, z >> 16), jnp.int32(0xFFFF))
    hd = jax.lax.population_count(folded)  # [TB, C0, P] i32
    has = jnp.zeros(enc.shape, bool)
    for w in range(W):
        has = has | (msk_ref[:, w * C0:(w + 1) * C0, :] != 0)
    match = has & (hd <= th) & resi
    # NOTE: weak python-int scalars inside where() send Mosaic's convert
    # lowering into infinite recursion under x64 — always wrap in jnp.int32
    hdm = jnp.where(match, hd, jnp.int32(HD_SENTINEL))
    min_ref[:] = jnp.min(jnp.min(hdm, axis=2), axis=1, keepdims=True)

    TB = enc.shape[0]
    P = enc.shape[2]
    seen = [jnp.zeros((TB, 1, P), jnp.int32) for _ in range(W)]
    cols = []                              # per x: [TB, S] counts
    for x in range(X):
        hit = match & (hd == x)            # [TB, C0, P]
        rows = []
        for w in range(W):
            msk_w = msk_ref[:, w * C0:(w + 1) * C0, :]
            sel = jnp.where(hit, msk_w, jnp.int32(0))
            # tree OR-fold over the candidate axis (log2(C0) wide VPU ops
            # instead of C0 single-row ones); zero-pad to a power of two
            width = 1 << max(C0 - 1, 0).bit_length()
            if width != C0:
                sel = jnp.concatenate(
                    [sel, jnp.zeros((TB, width - C0, P), jnp.int32)], axis=1)
            while width > 1:
                half = width // 2
                sel = sel[:, :half, :] | sel[:, half:, :]
                width = half
            plane = sel                     # [TB, 1, P]
            new = plane & ~seen[w]         # first x wins per (position, leaf)
            seen[w] = seen[w] | plane
            ns = min(S - w * 32, 32)
            shifts = jax.lax.broadcasted_iota(jnp.int32, (TB, ns, P), 1)
            bits = (new >> shifts) & jnp.int32(1)    # [TB, ns, P]
            rows.append(jnp.sum(bits, axis=2, dtype=jnp.int32))
        cols.append(rows[0] if W == 1 else jnp.concatenate(rows, axis=1))
    hist_ref[:] = jnp.stack(cols, axis=-1)           # [TB, S, X]


@functools.partial(jax.jit,
                   static_argnames=("th", "C0", "W", "S", "interpret"))
def probe_hist_tiles(enc_g: jax.Array, msk_g: jax.Array, res: jax.Array,
                     resident: jax.Array, th: int, C0: int, W: int, S: int,
                     interpret: bool = False):
    """Tiled fused probe epilogue.

    enc_g [N, C0, P] u32; msk_g [N, W*C0, P] u32; res [N, P] u32;
    resident [N, P] bool. Returns (hist [N, S, th+1] i32, minall [N] i32).
    """
    from jax.experimental import pallas as pl

    N, _, P = enc_g.shape
    X = th + 1
    TB = 64
    Np = ((N + TB - 1) // TB) * TB
    if Np != N:
        pad = Np - N
        enc_g = jnp.pad(enc_g, ((0, pad), (0, 0), (0, 0)))
        msk_g = jnp.pad(msk_g, ((0, pad), (0, 0), (0, 0)))
        res = jnp.pad(res, ((0, pad), (0, 0)))
        resident = jnp.pad(resident, ((0, pad), (0, 0)))
    enc_g = jax.lax.bitcast_convert_type(enc_g, jnp.int32)
    msk_g = jax.lax.bitcast_convert_type(msk_g, jnp.int32)
    res = jax.lax.bitcast_convert_type(res, jnp.int32)
    kern = functools.partial(_probe_hist_kernel, th=th, C0=C0, W=W, S=S)
    hist, minall = pl.pallas_call(
        kern,
        grid=(Np // TB,),
        # index maps use i*0 instead of literal 0: under x64 a literal
        # promotes to i64 and Mosaic fails to legalize the map's return
        in_specs=[
            pl.BlockSpec((TB, C0, P), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((TB, W * C0, P), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((TB, 1, P), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((TB, 1, P), lambda i: (i, i * 0, i * 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB, S, X), lambda i: (i, i * 0, i * 0)),
            pl.BlockSpec((TB, 1), lambda i: (i, i * 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, S, X), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ],
        interpret=interpret,
    )(enc_g, msk_g, res[:, None, :], resident[:, None, :].astype(jnp.int32))
    return hist[:N], minall[:N, 0]


def _packed_kernel(res_ref, light_ref, *refs, th: int, C0: int, S: int):
    """Packed-counter probe epilogue for one [TB, P] tile of strand-reads.

    Layout: rows = strand-reads (sublanes), lanes = read positions. Every
    input field is one [TB, P] i32 plane straight off the bucket-row gather
    (no transposes): ent_refs = (enc_0, mask_0, enc_1, mask_1, ...).

    The per-(position, leaf) minimum Hamming distance (the reference's
    Minfo::update_match dedupe, src/query.hpp:153-176) is computed with the
    leaf loop STATICALLY UNROLLED — bit s of the mask word is a
    compile-time shift — and the per-read histogram accumulates as
    base-256 packed counters: classes 0-2 in word 0 at bits 0/8/16,
    classes 3-5 in word 1, so the whole [S, X] histogram costs 2S lane
    reductions instead of S*X bit-expansion planes. Valid only while
    counts fit 8 bits (P <= 255) and X <= 6; the engine gates on that.
    """
    ent_refs = refs[: 2 * C0]               # inputs precede outputs
    hd_min_ref, out_ref = refs[2 * C0:]
    X = th + 1
    res = res_ref[:]
    light = light_ref[:] != 0
    # per-candidate gated Hamming distance: X marks "no match"
    hdg = []
    for c in range(C0):
        enc = ent_refs[2 * c][:]
        z = jnp.bitwise_xor(enc, res)
        folded = jnp.bitwise_and(jnp.bitwise_or(z, z >> 16),
                                 jnp.int32(0xFFFF))
        hd = jax.lax.population_count(folded)
        hdg.append(jnp.where((hd <= th) & light, hd, jnp.int32(X)))

    TB = res.shape[0]
    gm = jnp.full(res.shape, X, jnp.int32)
    for s in range(S):
        mh = None
        for c in range(C0):
            bit = (ent_refs[2 * c + 1][:] >> s) & jnp.int32(1)
            h = jnp.maximum(hdg[c], (jnp.int32(1) - bit) * jnp.int32(X))
            mh = h if mh is None else jnp.minimum(mh, h)
        gm = jnp.minimum(gm, mh)
        # shift amounts clamped so both select branches stay defined
        sh = jnp.int32(8) * mh
        sh0 = jnp.minimum(sh, jnp.int32(16))
        sh1 = jnp.clip(sh - jnp.int32(24), jnp.int32(0), jnp.int32(16))
        e0 = jnp.where(mh < 3, jnp.int32(1) << sh0, jnp.int32(0))
        e1 = jnp.where((mh >= 3) & (mh < X),
                       jnp.int32(1) << sh1, jnp.int32(0))
        # dtype pinned: under x64 jnp.sum would promote to (unsupported) i64
        w0 = jnp.sum(e0, axis=1, dtype=jnp.int32)
        w1 = jnp.sum(e1, axis=1, dtype=jnp.int32)
        # decode the base-256 packed counters in-kernel (the separate XLA
        # decode pass over [N, S, X] cost ~4 ms at production batches)
        for x in range(X):
            w = w0 if x < 3 else w1
            off = 8 * x if x < 3 else 8 * (x - 3)
            out_ref[:, s, x] = (w >> off) & jnp.int32(255)
    hd_min_ref[:] = jnp.min(gm, axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("th", "C0", "S", "interpret"))
def probe_hist_packed(res: jax.Array, light: jax.Array, ents, th: int,
                      C0: int, S: int, interpret: bool = False):
    """Packed-counter epilogue over [N, P] planes.

    res [N, P] u32; light [N, P] bool; ents = 2*C0 planes [N, P] u32
    (enc_c, mask_c alternating). Returns (hist [N, S, th+1] i32,
    minall [N] i32 with HD_SENTINEL for unmatched rows)."""
    from jax.experimental import pallas as pl

    N, P = res.shape
    X = th + 1
    assert X <= 6 and P <= 255 and S <= 32
    TB = 256
    Np = ((N + TB - 1) // TB) * TB
    if Np != N:
        pad = Np - N
        res = jnp.pad(res, ((0, pad), (0, 0)))
        light = jnp.pad(light, ((0, pad), (0, 0)))
        ents = [jnp.pad(e, ((0, pad), (0, 0))) for e in ents]
    res = jax.lax.bitcast_convert_type(res, jnp.int32)
    ents = [jax.lax.bitcast_convert_type(e, jnp.int32) for e in ents]
    kern = functools.partial(_packed_kernel, th=th, C0=C0, S=S)
    plane = pl.BlockSpec((TB, P), lambda i: (i, i * 0))
    hd_min, hist = pl.pallas_call(
        kern,
        grid=(Np // TB,),
        in_specs=[plane, plane] + [plane] * (2 * C0),
        out_specs=[
            pl.BlockSpec((TB, 1), lambda i: (i, i * 0)),
            pl.BlockSpec((TB, S, X), lambda i: (i, i * 0, i * 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, S, X), jnp.int32),
        ],
        interpret=interpret,
    )(res, light.astype(jnp.int32), *ents)
    minall = hd_min[:N, 0]
    minall = jnp.where(minall >= X, HD_SENTINEL, minall)
    return hist[:N], minall


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
