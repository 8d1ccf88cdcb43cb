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
# heavy buckets up to this depth are rescanned with one unrolled padded
# gather in the lanes formulation; deeper buckets take the E-slot loop
EVENT_TAIL_UNROLL = 24


def _shift_prev(x, fill):
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def event_probe_lanes(slots_d, enc_se, row_start, leaf_off, leaf_slots,
                      sidx, hrow, resident, res2,
                      th: int, C0: int, S: int, max_bucket: int,
                      E: int, KH: int, CAP_L: int, heavy_tab=None,
                      KR=None):
    """Lane-form event probe for the single-device engine.

    Same semantics as event_probe (the sharded path keeps that one: its
    per-shard dense histograms psum exactly), but everything stays in
    compacted lane form — no [N, S, X] histogram is ever materialised, so
    memory and compute are independent of the genome count S:

      0. probe lanes COMPACT to the resident set first (KR slots): with
         fractional m/r indexes half the lanes are non-resident, and the
         slots gather is the single largest cost — (sidx, res, hrow) pack
         into one 3-word row so the compacted fields cost ONE row gather;
      1. light pass over the first C0 dense slots; heavy buckets resolve
         through the heavy-bucket side table (one random row gather, see
         engine._build_heavy_tab) or the CSR unrolled gather, with only
         ultra-deep buckets taking the E-slot loop;
      2. matched (probe-lane, se, hd) events COMPACT to CAP_L slots before
         any expansion machinery runs, carrying packed se*8+hd payloads
         (one gather per source region instead of two);
      3. color -> leaf expansion via the sorted-marks trick, fetching
         (start, leaf-offset, lane*8+hd) as ONE packed row gather;
      4. the (strand-read, leaf, pos) dedupe sort; minall falls out of the
         sorted events as a segment-min (no separate plane reduction);
      5. returns per-(strand-read, leaf) lanes:
         (nb_lane [CAP_L] int32 with sentinel N for empty,
          leaf_lane [CAP_L] int32, hist_lanes [CAP_L, X] int32,
          minall [N] int32, overflow bool).
    """
    X = th + 1
    _, B, P = sidx.shape
    N = 2 * B
    Np = N * P
    nk = max(enc_se.shape[0], 1)
    from ..core.compact import (compact_mask_indices,
                                compact_mask_indices_strided)

    overflow = jnp.bool_(False)
    # ------------------------------------------ resident-lane compaction
    if KR is not None and KR < Np:
        fields = jnp.stack(
            [sidx.reshape(Np).astype(jnp.uint32), res2.reshape(Np),
             hrow.reshape(Np).astype(jnp.uint32)], axis=1)  # [Np, 3]
        ridx, nres, r_over = compact_mask_indices_strided(
            resident.reshape(Np), KR)
        overflow = (nres > KR) | r_over
        res_live = ridx < Np
        lane_of = jnp.minimum(ridx, Np - 1)              # original lane ids
        fr = fields[lane_of]                             # [KR, 3]
        sidx_c = fr[:, 0].astype(jnp.int32)
        res_c = fr[:, 1]
        hrow_c = fr[:, 2].astype(jnp.int32)
        NL = KR
    else:
        sidx_c = sidx.reshape(Np)
        res_c = res2.reshape(Np)
        hrow_c = hrow.reshape(Np)
        res_live = resident.reshape(Np)
        lane_of = jax.lax.iota(jnp.int32, Np)
        NL = Np

    # ---------------------------------------------------------- light pass
    d = slots_d[sidx_c]                                  # [NL, 1+2C0]
    word0 = d[:, 0].astype(jnp.int32)
    cnt_c = word0 & 255 if heavy_tab is not None else word0
    cnt = jnp.where(res_live, cnt_c, 0)
    heavy = cnt > C0
    light = res_live & jnp.logical_not(heavy)
    enc = d[:, 1: 1 + C0]
    se_l = d[:, 1 + C0: 1 + 2 * C0].astype(jnp.int32)
    hd_l = codec.hdist_lr32(enc, res_c[:, None])         # [NL, C0]
    jc = jax.lax.broadcasted_iota(jnp.int32, hd_l.shape, 1)
    lm = light[:, None] & (jc < cnt[:, None]) & (hd_l <= th)
    sehd_l = jnp.where(lm, se_l * 8 + hd_l, 0)           # packed payload

    # ----------------------------------------------------------- heavy tail
    ML = NL * C0
    ev_ok_parts = [lm.reshape(ML)]
    if max_bucket > C0:
        hidx, nheavy, blk_over = compact_mask_indices_strided(heavy, KH)
        overflow = overflow | (nheavy > KH) | blk_over
        # the compaction emits only set lanes; hidx < NL marks live
        live = hidx < NL
        hsafe = jnp.minimum(hidx, NL - 1)
        hres = res_c[hsafe]
        hlane = lane_of[hsafe]                           # original lane ids
        start = None
        if heavy_tab is not None:
            nh = heavy_tab.shape[0]
            MB = (heavy_tab.shape[1] - 1) // 2
            hid = jnp.clip((word0[hsafe] >> 8) - 1, 0, nh - 1)
            hrow_t = heavy_tab[hid]                      # [KH, 1 + 2*MB]
            hcnt = jnp.where(live, hrow_t[:, 0].astype(jnp.int32), 0)
            jj = jnp.arange(MB, dtype=jnp.int32)
            hd_h = codec.hdist_lr32(hrow_t[:, 1::2], hres[:, None])
            inb = jj[None, :] < jnp.minimum(hcnt, MB)[:, None]
            match_h = inb & (hd_h <= th)
            se_h = jnp.where(match_h, hrow_t[:, 2::2], 0).astype(jnp.int32)
        else:
            hurow = hrow_c[hsafe]
            start = row_start[hurow]
            hcnt = jnp.where(live, (row_start[hurow + 1] - start),
                             0).astype(jnp.int32)
            MB = min(max_bucket, EVENT_TAIL_UNROLL)
            jj = jnp.arange(MB, dtype=jnp.int32)
            eidx = jnp.minimum(start[:, None] + jj[None, :], nk - 1)
            pair_h = enc_se[eidx]                        # [KH, MB, 2]
            hd_h = codec.hdist_lr32(pair_h[..., 0], hres[:, None])
            inb = jj[None, :] < jnp.minimum(hcnt, MB)[:, None]
            match_h = inb & (hd_h <= th)
            se_h = jnp.where(match_h, pair_h[..., 1], 0).astype(jnp.int32)
        sehd_h = jnp.where(match_h, se_h * 8 + hd_h, 0)
        if max_bucket > MB:
            # ultra-deep remainder: E-slot insertion loop from j0 = MB
            K2 = max(KH // 8, 256)
            deep = live & (hcnt > MB)
            didx, ndeep = compact_mask_indices(deep, K2)
            overflow = overflow | (ndeep > K2)
            dsafe = jnp.minimum(didx, KH - 1)
            dlive = didx < KH
            dcnt = jnp.where(dlive, hcnt[dsafe], 0)
            if start is None:
                dstart = row_start[hrow_c[hsafe[dsafe]]]
            else:
                dstart = start[dsafe]
            dres = hres[dsafe]
            je = jax.lax.broadcasted_iota(jnp.int32, (K2, E), 1)

            def body(carry):
                j, bsehd, nm = carry
                ii = jnp.minimum(dstart + j, nk - 1)
                pr = enc_se[ii]
                hdd = codec.hdist_lr32(pr[..., 0], dres)
                m = (j < dcnt) & (hdd <= th)
                put = m[:, None] & (nm[:, None] == je)
                bsehd = jnp.where(
                    put, (pr[..., 1].astype(jnp.int32) * 8 + hdd)[:, None],
                    bsehd)
                nm = nm + m.astype(jnp.int32)
                return j + 1, bsehd, nm

            hmax = jnp.minimum(jnp.max(dcnt), max_bucket)
            _, bsehd, nm = jax.lax.while_loop(
                lambda c: c[0] < hmax, body,
                (jnp.int32(MB), jnp.zeros((K2, E), jnp.int32),
                 jnp.zeros((K2,), jnp.int32)))
            overflow = overflow | jnp.any(nm > E)
        MH = KH * MB
        ev_ok_parts.append(match_h.reshape(MH))
        if max_bucket > MB:
            MD = K2 * E
            hv = dlive[:, None] & (je < jnp.minimum(nm, E)[:, None])
            ev_ok_parts.append(hv.reshape(MD))

    # --------------------------- compact matched events, then gather fields
    ev_ok = jnp.concatenate(ev_ok_parts)
    Mtot = ev_ok.shape[0]
    eidx_c, nev, ev_blk_over = compact_mask_indices_strided(ev_ok, CAP_L)
    overflow = overflow | (nev > CAP_L) | ev_blk_over
    ev_valid = eidx_c < Mtot
    esafe = jnp.minimum(eidx_c, Mtot - 1)

    # piecewise source decode: light block, heavy block, deep block; each
    # region contributes one packed se*8+hd gather plus its lane decode
    in_light = esafe < ML
    lsafe = jnp.minimum(esafe, ML - 1)
    ev_sehd = jnp.where(in_light, sehd_l.reshape(ML)[lsafe], 0)
    ev_lane = jnp.where(in_light, lane_of[lsafe // C0], 0)
    if max_bucket > C0:
        hoff = esafe - ML
        in_heavy = (esafe >= ML) & (hoff < MH)
        hsafe2 = jnp.clip(hoff, 0, MH - 1)
        klane = hsafe2 // MB
        ev_sehd = jnp.where(in_heavy, sehd_h.reshape(MH)[hsafe2], ev_sehd)
        ev_lane = jnp.where(in_heavy, hlane[klane], ev_lane)
        if max_bucket > MB:
            doff = esafe - ML - MH
            in_deep = doff >= 0
            dsafe2 = jnp.clip(doff, 0, MD - 1)
            k2lane = dsafe2 // E
            ev_sehd = jnp.where(in_deep, bsehd.reshape(MD)[dsafe2],
                                ev_sehd)
            ev_lane = jnp.where(in_deep,
                                hlane[jnp.minimum(dsafe[k2lane], KH - 1)],
                                ev_lane)
    ev_sehd = jnp.where(ev_valid, ev_sehd, 0)

    # --------------------------------------------- color -> leaf expansion
    # Each event e owns output slots [cum[e]-cards[e], cum[e]); the owner
    # of slot t is recovered with one mark scatter + cumsum. The three
    # per-event fields the expansion needs (start slot, leaf-CSR offset,
    # lane*8+hd) ride in ONE packed row so the per-slot fetch is a single
    # [CAP_L, 3] row gather.
    se_ok = (ev_sehd >> 3).astype(jnp.int64)
    offs = leaf_off[se_ok]
    cards = jnp.where(ev_valid, leaf_off[se_ok + 1] - offs, 0)
    cum = jnp.cumsum(cards)
    T = cum[-1]
    overflow = overflow | (T > CAP_L)
    starts = cum - cards
    starts_c = jnp.where(starts < CAP_L, starts, CAP_L)
    marks = jnp.zeros((CAP_L,), jnp.int32).at[starts_c].add(
        1, mode="drop", indices_are_sorted=True)
    evc = jnp.maximum(jnp.cumsum(marks) - 1, 0)
    t = jnp.arange(CAP_L, dtype=jnp.int64)
    tv = t < jnp.minimum(T, CAP_L)
    lanehd = ev_lane * 8 + (ev_sehd & 7)
    trio = jnp.stack([starts.astype(jnp.int32),
                      (offs - starts).astype(jnp.int32), lanehd], axis=1)
    tr = trio[evc]                                       # [CAP_L, 3]
    base = tr[:, 0].astype(jnp.int64)
    lidx = tr[:, 1].astype(jnp.int64) + t
    lidx = jnp.clip(lidx, 0, max(leaf_slots.shape[0] - 1, 0))
    leaf = jnp.where(tv, leaf_slots[lidx].astype(jnp.int32), 0)
    lane_t = tr[:, 2] >> 3
    hd_t = tr[:, 2] & 7
    nb = lane_t // P
    p = lane_t - nb * P

    # ------------------------------------------------- sort + dedupe + hist
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
    # minall falls out of the sorted events: every match is an event (or
    # the batch re-runs on overflow), so the per-strand-read minimum hd is
    # one sorted segment-min
    minall = jnp.minimum(jax.ops.segment_min(
        jnp.where(valid_s, hd_s, HD_SENTINEL),
        jnp.minimum(k1s, N), num_segments=N + 1,
        indices_are_sorted=True)[:N], HD_SENTINEL)
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
    nb_lane = jnp.where(nb_lane >= 0, nb_lane, N).astype(jnp.int32)
    return (nb_lane, leaf_lane.astype(jnp.int32), hist_lanes, minall,
            overflow)


def event_probe(slots_d, enc_se, row_start, leaf_off, leaf_slots,
                sidx, hrow, resident, res2,
                th: int, C0: int, S: int, max_bucket: int,
                E: int, KH: int, CAP_L: int, heavy_tab=None):
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
    word0 = d[..., 0].astype(jnp.int32)
    # single-device tables pack cnt | (hid+1) << 8 into the count word
    # (engine._build_heavy_tab); this dense form only needs the count
    cnt_c = word0 & 255 if heavy_tab is not None else word0
    cnt = jnp.where(resident, cnt_c, 0)
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
