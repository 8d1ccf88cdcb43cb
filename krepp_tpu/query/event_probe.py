"""Event-formulated stage-1 probe: scalable to many-genome indexes.

The mask probe expands every matched color to an S-bit leaf plane per
(position, hdist) — O(S) VPU work per probe and O(nse * S/32) HBM for the
bitmask table, both infeasible past a few hundred genomes. The event probe
replaces planes with *match events*, the TPU reformulation of the
reference's per-read sparse maps (ref: src/query.hpp:153-176):

  1. collect matched (probe-lane, se, hd) pairs — light buckets read their
     first C0 entries from the bucket-row table; deeper buckets go through
     a compacted full-depth rescan holding at most E matches per probe;
  2. expand colors to (strand-read, pos, leaf-slot, hd) events through the
     per-color leaf-slot CSR. Work = total cardinality of matched colors,
     exactly the reference's per-match BFS decode cost
     (ref: src/query.cpp:369-387);
  3. sort events by (strand-read, leaf, pos, hd) and keep the first event
     per (strand-read, leaf, pos): the order-independent formulation of
     Minfo::update_match's per-position min-dedupe;
  4. segment-sum per-(strand-read, leaf) lane histograms and scatter the
     (unique) lanes into the dense [N, S, X] stage-2 input.

Every fixed capacity (heavy-probe count KH, per-probe matches E, leaf
events CAP_L) carries an overflow flag; the engine re-runs overflowing
batches at a larger tier, so no result is ever silently truncated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import codec

HD_SENTINEL = 255


def _shift_prev(x, fill):
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def event_probe(slots_d, enc_se, row_start, leaf_off, leaf_slots,
                sidx, hrow, resident, res2,
                th: int, C0: int, S: int, max_bucket: int,
                E: int, KH: int, CAP_L: int):
    """Probe + color expansion + dedupe. sidx/hrow/resident/res2: [2, B, P].

    slots_d: 'se'-flavor bucket-row table [nrows, 1 + 2*C0]
    leaf_off: int64 [nse + 1]; leaf_slots: int32 leaf-slot CSR values.
    Returns (hist [N, S, X] int32, minall [N] int32, overflow bool).
    """
    X = th + 1
    _, B, P = sidx.shape
    N = 2 * B
    Np = N * P
    nk = max(enc_se.shape[0], 1)

    # ---------------------------------------------------------- light pass
    d = slots_d[sidx]                                    # [2, B, P, 1+2C0]
    cnt = jnp.where(resident, d[..., 0].astype(jnp.int32), 0)
    heavy = cnt > C0
    light = resident & jnp.logical_not(heavy)
    enc = d[..., 1: 1 + C0]
    se_l = d[..., 1 + C0: 1 + 2 * C0].astype(jnp.int32)
    hd_l = codec.hdist_lr32(enc, res2[..., None])        # [2, B, P, C0]
    jc = jax.lax.broadcasted_iota(jnp.int32, hd_l.shape, 3)
    lm = light[..., None] & (jc < cnt[..., None]) & (hd_l <= th)
    gmin_l = jnp.min(jnp.where(lm, hd_l, HD_SENTINEL), axis=-1)
    minall = jnp.min(gmin_l, axis=-1).reshape(N)         # [N]

    lane = jnp.arange(Np, dtype=jnp.int32)
    ev_lane = [jnp.repeat(lane, C0, total_repeat_length=Np * C0)]
    ev_se = [se_l.reshape(Np * C0)]
    ev_hd = [jnp.where(lm, hd_l, 0).reshape(Np * C0)]
    ev_ok = [lm.reshape(Np * C0)]

    # ----------------------------------------------------------- heavy tail
    overflow = jnp.bool_(False)
    if max_bucket > C0:
        from ..core.compact import compact_mask_indices

        hf = heavy.reshape(Np)
        hidx, nheavy = compact_mask_indices(hf, KH)
        overflow = nheavy > KH
        live = (hidx < Np) & hf[jnp.minimum(hidx, Np - 1)]
        hidx = jnp.minimum(hidx, Np - 1)
        hurow = hrow.reshape(Np)[hidx]
        hres = res2.reshape(Np)[hidx]
        start = row_start[hurow]
        hcnt = jnp.where(live, (row_start[hurow + 1] - start), 0)
        hcnt = hcnt.astype(jnp.int32)
        hmax = jnp.minimum(jnp.max(hcnt), max_bucket)

        je = jax.lax.broadcasted_iota(jnp.int32, (KH, E), 1)

        def body(carry):
            j, bse, bhd, nm, gm = carry
            idx = jnp.minimum(start + j, nk - 1)
            pair = enc_se[idx]
            hd = codec.hdist_lr32(pair[..., 0], hres)
            m = (j < hcnt) & (hd <= th)
            gm = jnp.where(m, jnp.minimum(gm, hd), gm)
            put = m[:, None] & (nm[:, None] == je)
            bse = jnp.where(put, pair[..., 1].astype(jnp.int32)[:, None], bse)
            bhd = jnp.where(put, hd[:, None], bhd)
            nm = nm + m.astype(jnp.int32)
            return j + 1, bse, bhd, nm, gm

        def cond(carry):
            return carry[0] < hmax

        bse0 = jnp.zeros((KH, E), jnp.int32)
        bhd0 = jnp.zeros((KH, E), jnp.int32)
        nm0 = jnp.zeros((KH,), jnp.int32)
        gm0 = jnp.full((KH,), HD_SENTINEL, jnp.int32)
        _, bse, bhd, nm, hgmin = jax.lax.while_loop(
            cond, body, (jnp.int32(0), bse0, bhd0, nm0, gm0))
        overflow = overflow | jnp.any(nm > E)
        hv = live[:, None] & (je < jnp.minimum(nm, E)[:, None])
        ev_lane.append(jnp.repeat(hidx.astype(jnp.int32), E,
                                  total_repeat_length=KH * E))
        ev_se.append(bse.reshape(KH * E))
        ev_hd.append(bhd.reshape(KH * E))
        ev_ok.append(hv.reshape(KH * E))

        nb_h = (hidx // P).astype(jnp.int32)
        hgmin = jnp.where(live, hgmin, HD_SENTINEL)
        minall = minall.at[nb_h].min(hgmin, mode="drop")

    ev_lane = jnp.concatenate(ev_lane)
    ev_se = jnp.concatenate(ev_se)
    ev_hd = jnp.concatenate(ev_hd)
    ev_ok = jnp.concatenate(ev_ok)
    M = ev_lane.shape[0]

    # --------------------------------------------- color -> leaf expansion
    # Each event e owns output slots [cum[e]-cards[e], cum[e]). The owner of
    # slot t is recovered with a sorted scatter of one mark per event at its
    # start slot + a cumsum — O(M + CAP_L) instead of the O(CAP_L * log M)
    # random gathers a searchsorted would cost (binary search dominates the
    # whole probe on TPU).
    se_ok = jnp.where(ev_ok, ev_se, 0).astype(jnp.int64)
    cards = jnp.where(ev_ok, leaf_off[se_ok + 1] - leaf_off[se_ok], 0)
    cum = jnp.cumsum(cards)                              # int64 [M]
    T = cum[-1]
    overflow = overflow | (T > CAP_L)
    starts = cum - cards                                 # nondecreasing
    starts_c = jnp.where(starts < CAP_L, starts, CAP_L)  # OOB -> dropped
    marks = jnp.zeros((CAP_L,), jnp.int32).at[starts_c].add(
        1, mode="drop", indices_are_sorted=True)
    # last event with start <= t == the owning event (later events start at
    # or after the owner's cum, which is > t)
    evc = jnp.maximum(jnp.cumsum(marks) - 1, 0)
    t = jnp.arange(CAP_L, dtype=jnp.int64)
    tv = t < jnp.minimum(T, CAP_L)
    base = starts[evc]
    lidx = leaf_off[se_ok[evc]] + (t - base)
    lidx = jnp.clip(lidx, 0, max(leaf_slots.shape[0] - 1, 0))
    leaf = leaf_slots[lidx].astype(jnp.int32)            # [CAP_L]
    lane_t = ev_lane[evc]
    nb = lane_t // P
    p = lane_t - nb * P
    hd_t = ev_hd[evc]

    # ------------------------------------------------- sort + dedupe + hist
    # (strand-read, leaf) packs into one 31-bit key whenever the index is
    # not astronomically wide — a 2-key sort is measurably cheaper than a
    # 3-key one at millions of events
    sbits = max(S - 1, 1).bit_length()
    k3 = p * 8 + hd_t
    if (N + 1) << sbits < 2**31:
        kl = jnp.where(tv, (nb << sbits) | leaf, N << sbits)
        kls, k3s = jax.lax.sort((kl, k3), num_keys=2)
        k1s = kls >> sbits
        k2s = kls & ((1 << sbits) - 1)
        new_lane = kls != _shift_prev(kls, -1)
    else:
        k1 = jnp.where(tv, nb, N).astype(jnp.int32)
        k1s, k2s, k3s = jax.lax.sort((k1, leaf, k3), num_keys=3)
        new_lane = ((k1s != _shift_prev(k1s, -1))
                    | (k2s != _shift_prev(k2s, -1)))
    valid_s = k1s < N
    ps = k3s >> 3
    new_pos = new_lane | (ps != _shift_prev(ps, -1))
    first = new_pos & valid_s
    lane_id = jnp.cumsum((new_lane & valid_s).astype(jnp.int32)) - 1
    lane_id = jnp.maximum(lane_id, 0)

    hd_s = k3s & 7
    onehot = (hd_s[:, None] == jnp.arange(X, dtype=jnp.int32)[None, :])
    contrib = (onehot & first[:, None]).astype(jnp.int32)
    hist_lanes = jax.ops.segment_sum(contrib, lane_id, num_segments=CAP_L,
                                     indices_are_sorted=True)
    nb_lane = jax.ops.segment_max(jnp.where(valid_s, k1s, -1), lane_id,
                                  num_segments=CAP_L,
                                  indices_are_sorted=True)
    leaf_lane = jax.ops.segment_max(jnp.where(valid_s, k2s, 0), lane_id,
                                    num_segments=CAP_L,
                                    indices_are_sorted=True)

    nbi = jnp.where(nb_lane >= 0, nb_lane, N)            # OOB rows dropped
    hist = jnp.zeros((N, S, X), jnp.int32)
    # lanes are unique and already (nb, leaf)-sorted; the invalid tail maps
    # to the dropped out-of-bounds row N
    hist = hist.at[nbi, leaf_lane].add(hist_lanes, mode="drop",
                                       indices_are_sorted=True,
                                       unique_indices=False)
    return hist, minall, overflow
