"""Banded Smith-Waterman seed extension on device.

Vectorizes the scalar extension DP (behavioral spec: bandedSWA.cpp:116-237 ==
ksw_extend2) ACROSS PAIRS: lane = one extension problem, exactly like the
reference's SIMD strategy of one SeqPair per SSE/AVX lane with length-sorted
batches (bandedSWA.cpp:1997-2126).  Shapes are fixed per bucket
(query<=Qmax, target<=Tmax) so XLA compiles once per bucket; oversized tail
pairs fall back to the native host kernel, mirroring the reference's
8-bit/16-bit/scalar class split (sortPairsLenExt, bwamem.cpp:1926-2023).

All the scalar kernel's control flow is reproduced with masks: adaptive band
[beg, end) including the post-row shrink-to-nonzero scan, per-row max with
the rightmost-tie rule, z-drop and row-max==0 termination, end-bonus gscore
tracking.  Outputs are bit-identical to the host kernel (tested).

Each DP row is computed as pure VECTOR ops over the whole query dimension
(no sequential column loop): the only intra-row dependency — the F (gap in
query) running max — unrolls to a prefix-max scan with linear decay,
  f[j] = max_{j'<j} (relu(M[j'] - oe_ins) + j'*e_ins) - (j-1)*e_ins,
computed with lax.cummax.  H's column-shifted storage (eh[j].h = H[i][j-1],
the rotation that feeds the next row's diagonal) and the stale out-of-band
cells are preserved exactly, so results stay bit-identical.

DNA scoring is computed arithmetically (match/mismatch/ambig) instead of a
5x5 gather — bwa_fill_scmat matrices always have that structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
NEG_BIG = jnp.int32(-(1 << 30))


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13, 14, 15))
def bsw_kernel(q, t, qlen, tlen, h0, w_in, mat_a, mat_b,
               o_del: int, e_del: int, o_ins: int, e_ins: int,
               zdrop: int, end_bonus: int, max_sc: int,
               h0cap: int = 1 << 30):
    """Batched banded SW extension over materialized sequence tiles.

    q: int{8,32}[P, Qmax] query codes (lane-padded with 4), t: [P, Tmax],
    qlen/tlen/h0/w_in: int32[P].  mat_a/mat_b: match score / mismatch penalty
    (positive).  Returns int32[P, 6]: score qle tle gtle gscore max_off."""
    return _bsw_dp(q, t, qlen, tlen, h0, w_in, mat_a, mat_b, o_del, e_del,
                   o_ins, e_ins, zdrop, end_bonus, max_sc, h0cap)


@partial(jax.jit,
         static_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22))
def bsw_desc_kernel(ref, enc, qoff, qdir, qlen, toff, tdir, tlen, h0, w_in,
                    Qmax: int, Tmax: int, mat_a: int, mat_b: int,
                    o_del: int, e_del: int, o_ins: int, e_ins: int,
                    zdrop: int, end_bonus: int, max_sc: int,
                    ref_packed: bool = False, h0cap: int = 1 << 30):
    """Banded SW extension from DESCRIPTORS: sequences are gathered on
    device from the resident doubled-genome `ref` (uint8[2*l_pac], absolute
    toff/tdir walk) and the padded read grid `enc` (int8[N, L]; qoff is the
    flattened row*L+col start, qdir the walk direction — left extensions
    walk -1, mirroring the reference's reversed SoA copies,
    bwamem.cpp:2206-2434).  Only ~40 bytes/pair cross the host->device link
    instead of the padded sequence tiles."""
    N, L = enc.shape
    enc_flat = enc.reshape(-1).astype(I32)
    jidx = jnp.arange(Qmax, dtype=I32)[None, :]
    qpos = qoff[:, None] + qdir[:, None] * jidx
    q = jnp.where(jidx < qlen[:, None],
                  enc_flat[jnp.clip(qpos, 0, N * L - 1)], 4)
    from .device_index import take_ref
    iidx = jnp.arange(Tmax, dtype=jnp.int64)[None, :]
    tpos = toff[:, None] + tdir[:, None].astype(jnp.int64) * iidx
    t = jnp.where(iidx < tlen[:, None], take_ref(ref, tpos, ref_packed), 4)
    return _bsw_dp(q, t, qlen, tlen, h0, w_in, mat_a, mat_b, o_del, e_del,
                   o_ins, e_ins, zdrop, end_bonus, max_sc, h0cap)


def _bsw_dp(q, t, qlen, tlen, h0, w_in, mat_a, mat_b,
            o_del: int, e_del: int, o_ins: int, e_ins: int,
            zdrop: int, end_bonus: int, max_sc: int,
            h0cap: int = 1 << 30):
    P, Qmax = q.shape
    Tmax = t.shape[1]
    # Precision tiering (the reference's 8/16-bit class split,
    # bandedSWA.h:59-83, bwamem.cpp:2302): the TPU VPU runs int16/int8
    # element ops ~9x faster than int32 (measured on v5e), so the (P, Q)
    # DP grids are carried in the narrowest type that provably cannot
    # overflow.  Cell values are bounded by h0 + Tmax*match (+ col*e_ins
    # inside the prefix-max trick); anything larger falls back to int32 —
    # results are bit-identical either way (tested).
    # h0 (= seed_len * a) enters row 0 directly and is unbounded by the
    # tile caps (a 20kb read's seed can carry h0 > 32767): callers pass a
    # static h0cap covering the batch or the int32 path is used
    hmax_bound = h0cap + (Qmax + Tmax) * max_sc + end_bonus + 1
    u_bound = hmax_bound + (Qmax + 1) * e_ins
    DT = jnp.int16 if u_bound < 16000 and e_ins <= 32 and e_del <= 32 \
        else I32
    q = q.astype(I32)
    t = t.astype(I32)
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    cols = jnp.arange(Qmax + 1, dtype=I32)[None, :]          # (1, Qmax+1)
    qcols = jnp.concatenate([q, jnp.full((P, 1), 4, I32)], axis=1)

    # first row: H[j] = max(h0 - oe_ins - (j-1)*e_ins, 0), H[0] = h0
    tj = h0[:, None] - oe_ins - (cols - 1) * e_ins
    H = jnp.where(cols == 0, h0[:, None], jnp.maximum(tj, 0)).astype(I32)
    H = jnp.where(cols <= qlen[:, None], H, 0)
    E = jnp.zeros((P, Qmax + 1), I32)
    if DT is not I32:
        return _bsw_rows_narrow(q, t, qlen, tlen, h0, w_in, H, E, cols,
                                qcols, mat_a, mat_b, o_del, e_del, o_ins,
                                e_ins, zdrop, end_bonus, max_sc, DT)

    # clamp the band (bandedSWA.cpp:147-156)
    max_ins = jnp.floor((qlen * max_sc + end_bonus - o_ins) / e_ins + 1.0) \
        .astype(I32)
    max_del = jnp.floor((qlen * max_sc + end_bonus - o_del) / e_del + 1.0) \
        .astype(I32)
    w = jnp.minimum(w_in, jnp.maximum(max_ins, 1))
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    mx = h0.astype(I32)
    max_i = jnp.full((P,), -1, I32)
    max_j = jnp.full((P,), -1, I32)
    max_ie = jnp.full((P,), -1, I32)
    gscore = jnp.full((P,), -1, I32)
    max_off = jnp.zeros((P,), I32)
    beg = jnp.zeros((P,), I32)
    end = qlen.astype(I32)
    done = tlen <= 0

    def row_body(i, st):
        (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
         done) = st
        act_row = ~done & (i < tlen)
        beg_r = jnp.maximum(beg, i - w)
        end_r = jnp.minimum(jnp.minimum(end, i + w + 1), qlen)
        ti = jax.lax.dynamic_slice_in_dim(
            t, jnp.minimum(i, Tmax - 1), 1, axis=1)[:, 0]
        h1_0 = jnp.where(beg_r == 0,
                         jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0),
                         0).astype(I32)

        band = (cols >= beg_r[:, None]) & (cols < end_r[:, None])  # (P,Q+1)
        # M[j] = diagonal input: the column-shifted H slot (+ score), exactly
        # the scalar's "M = eh[j].h" read-before-write
        s_ij = jnp.where((ti[:, None] >= 4) | (qcols >= 4), -1,
                         jnp.where(ti[:, None] == qcols, mat_a,
                                   -mat_b)).astype(I32)
        Mv = jnp.where(H != 0, H + s_ij, 0)
        # f via prefix-max scan with linear decay (see module docstring)
        u = jnp.where(band, jnp.maximum(Mv - oe_ins, 0) + cols * e_ins,
                      NEG_BIG)
        upre = jnp.concatenate([jnp.full((P, 1), NEG_BIG, I32),
                                jax.lax.cummax(u, axis=1)[:, :-1]], axis=1)
        fv = upre - jnp.maximum(cols - 1, 0) * e_ins
        hv = jnp.maximum(jnp.maximum(Mv, E), fv)
        hv = jnp.where(band, hv, 0)
        # row max with rightmost-tie rule
        m = jnp.max(hv, axis=1)
        is_max = band & (hv == m[:, None])
        mj = jnp.max(jnp.where(is_max, cols, -1), axis=1)
        mj = jnp.where(act_row & (m > 0), mj, -1)
        # h1 carry entering column j is hv[j-1] (h1_0 at the band start)
        carry = jnp.concatenate([h1_0[:, None],
                                 jnp.where(band, hv, 0)[:, :-1]], axis=1)
        carry = jnp.where(cols == beg_r[:, None], h1_0[:, None], carry)
        h1_end = jnp.where(end_r > beg_r,
                           jnp.take_along_axis(
                               hv, jnp.maximum(end_r - 1, 0)[:, None],
                               axis=1)[:, 0],
                           h1_0)
        wr = act_row[:, None] & band
        H = jnp.where(wr, carry, H)
        E = jnp.where(wr, jnp.maximum(E - e_del,
                                      jnp.maximum(Mv - oe_del, 0)), E)

        # eh[end].h = h1; eh[end].e = 0
        endcol = end_r[:, None]
        at_end = act_row[:, None] & (cols == endcol)
        H = jnp.where(at_end, h1_end[:, None], H)
        E = jnp.where(at_end, 0, E)

        # gscore bookkeeping when the row spans the full query
        full = act_row & (end_r == qlen)
        max_ie = jnp.where(full & (gscore <= h1_end), i, max_ie)
        gscore = jnp.where(full, jnp.maximum(gscore, h1_end), gscore)
        m = jnp.where(act_row, m, 0)
        mj = jnp.where(act_row, mj, -1)

        # termination + max update + zdrop
        newly_done = act_row & (m == 0)
        upd = act_row & (m > mx)
        off = jnp.abs(mj - i)
        max_off = jnp.where(upd, jnp.maximum(max_off, off), max_off)
        mx2 = jnp.where(upd, m, mx)
        max_i = jnp.where(upd, i, max_i)
        max_j = jnp.where(upd, mj, max_j)
        if zdrop > 0:
            del_case = (i - max_i) > (mj - max_j)
            zd = jnp.where(
                del_case,
                mx - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop,
                mx - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop)
            newly_done = newly_done | (act_row & ~upd & ~(m == 0) & zd)
        mx = mx2

        # band shrink to the nonzero region (bandedSWA.cpp:218-221)
        nz = (H != 0) | (E != 0)
        inA = (cols >= beg_r[:, None]) & (cols < end_r[:, None]) & nz
        first = jnp.min(jnp.where(inA, cols, Qmax + 2), axis=1)
        beg_n = jnp.minimum(first, end_r)
        inB = (cols >= beg_r[:, None]) & (cols <= end_r[:, None]) & nz
        last = jnp.max(jnp.where(inB, cols, beg_r[:, None] - 1), axis=1)
        end_n = jnp.minimum(last + 2, qlen)

        keep = act_row & ~newly_done
        beg = jnp.where(keep, beg_n, beg_r)
        end = jnp.where(keep, end_n, end_r)
        done = done | newly_done
        return (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
                done)

    st = (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end, done)
    st = jax.lax.fori_loop(0, Tmax, row_body, st)
    (_, _, mx, max_i, max_j, max_ie, gscore, max_off, _, _, _) = st
    out = jnp.stack([mx, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off],
                    axis=1)
    return out


def _bsw_rows_narrow(q, t, qlen, tlen, h0, w_in, H0, E0, cols, qcols,
                     mat_a, mat_b, o_del: int, e_del: int, o_ins: int,
                     e_ins: int, zdrop: int, end_bonus: int, max_sc: int,
                     DT):
    """The same row loop as _bsw_dp's int32 tail, with the (P, Q) grids
    carried in DT (int16): identical arithmetic, 9x the VPU rate.  All
    per-lane (P,) bookkeeping stays int32; callers guarantee no value can
    exceed the narrow range (see the bound check in _bsw_dp)."""
    P, Qmax = q.shape
    Tmax = t.shape[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    NEG = jnp.asarray(-16384, DT)
    colsN = cols.astype(DT)
    qcolsN = qcols.astype(DT)

    H = H0.astype(DT)
    E = E0.astype(DT)
    mx = h0.astype(I32)
    max_i = jnp.full((P,), -1, I32)
    max_j = jnp.full((P,), -1, I32)
    max_ie = jnp.full((P,), -1, I32)
    gscore = jnp.full((P,), -1, I32)
    max_off = jnp.zeros((P,), I32)
    beg = jnp.zeros((P,), I32)
    end = qlen.astype(I32)
    done = tlen <= 0

    def row_body(i, st):
        (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
         done) = st
        act_row = ~done & (i < tlen)
        beg_r = jnp.maximum(beg, i - w_inc)
        end_r = jnp.minimum(jnp.minimum(end, i + w_inc + 1), qlen)
        ti = jax.lax.dynamic_slice_in_dim(
            t, jnp.minimum(i, Tmax - 1), 1, axis=1)[:, 0]
        h1_0 = jnp.where(beg_r == 0,
                         jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0),
                         0).astype(DT)

        begN = beg_r.astype(DT)[:, None]
        endN = end_r.astype(DT)[:, None]
        band = (colsN >= begN) & (colsN < endN)
        s_ij = jnp.where((ti[:, None] >= 4) | (qcolsN >= 4),
                         jnp.asarray(-1, DT),
                         jnp.where(ti[:, None].astype(DT) == qcolsN,
                                   jnp.asarray(mat_a, DT),
                                   jnp.asarray(-mat_b, DT)))
        Mv = jnp.where(H != 0, H + s_ij, 0).astype(DT)
        u = jnp.where(band, jnp.maximum(Mv - oe_ins, 0).astype(DT)
                      + colsN * e_ins, NEG)
        upre = jnp.concatenate([jnp.full((P, 1), NEG, DT),
                                jax.lax.cummax(u, axis=1)[:, :-1]], axis=1)
        fv = upre - jnp.maximum(colsN - 1, 0) * e_ins
        hv = jnp.maximum(jnp.maximum(Mv, E), fv)
        hv = jnp.where(band, hv, 0).astype(DT)
        m = jnp.max(hv, axis=1).astype(I32)
        is_max = band & (hv == m[:, None].astype(DT))
        mj = jnp.max(jnp.where(is_max, colsN, jnp.asarray(-1, DT)),
                     axis=1).astype(I32)
        mj = jnp.where(act_row & (m > 0), mj, -1)
        carry = jnp.concatenate([h1_0[:, None],
                                 jnp.where(band, hv, 0)[:, :-1]], axis=1)
        carry = jnp.where(colsN == begN, h1_0[:, None], carry)
        h1_end = jnp.where(end_r > beg_r,
                           jnp.take_along_axis(
                               hv, jnp.maximum(end_r - 1, 0)[:, None],
                               axis=1)[:, 0],
                           h1_0).astype(I32)
        wr = act_row[:, None] & band
        H = jnp.where(wr, carry, H)
        E = jnp.where(wr, jnp.maximum(E - e_del,
                                      jnp.maximum(Mv - oe_del, 0)), E) \
            .astype(DT)

        at_end = act_row[:, None] & (colsN == endN)
        H = jnp.where(at_end, h1_end[:, None].astype(DT), H)
        E = jnp.where(at_end, 0, E).astype(DT)

        full = act_row & (end_r == qlen)
        max_ie = jnp.where(full & (gscore <= h1_end), i, max_ie)
        gscore = jnp.where(full, jnp.maximum(gscore, h1_end), gscore)
        m = jnp.where(act_row, m, 0)
        mj = jnp.where(act_row, mj, -1)

        newly_done = act_row & (m == 0)
        upd = act_row & (m > mx)
        off = jnp.abs(mj - i)
        max_off = jnp.where(upd, jnp.maximum(max_off, off), max_off)
        mx2 = jnp.where(upd, m, mx)
        max_i = jnp.where(upd, i, max_i)
        max_j = jnp.where(upd, mj, max_j)
        if zdrop > 0:
            del_case = (i - max_i) > (mj - max_j)
            zd = jnp.where(
                del_case,
                mx - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop,
                mx - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop)
            newly_done = newly_done | (act_row & ~upd & ~(m == 0) & zd)
        mx = mx2

        nz = (H != 0) | (E != 0)
        inA = band & nz
        first = jnp.min(jnp.where(inA, colsN, jnp.asarray(Qmax + 2, DT)),
                        axis=1).astype(I32)
        beg_n = jnp.minimum(first, end_r)
        inB = (colsN >= begN) & (colsN <= endN) & nz
        last = jnp.max(jnp.where(inB, colsN, begN - 1), axis=1)             .astype(I32)
        end_n = jnp.minimum(last + 2, qlen)

        keep = act_row & ~newly_done
        beg = jnp.where(keep, beg_n, beg_r)
        end = jnp.where(keep, end_n, end_r)
        done = done | newly_done
        return (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
                done)

    # clamp the band exactly like the int32 tail
    max_ins = jnp.floor((qlen * max_sc + end_bonus - o_ins) / e_ins + 1.0) \
        .astype(I32)
    max_del = jnp.floor((qlen * max_sc + end_bonus - o_del) / e_del + 1.0) \
        .astype(I32)
    w_inc = jnp.minimum(w_in, jnp.maximum(max_ins, 1))
    w_inc = jnp.minimum(w_inc, jnp.maximum(max_del, 1))

    st = (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end, done)
    st = jax.lax.fori_loop(0, Tmax, row_body, st)
    (_, _, mx, max_i, max_j, max_ie, gscore, max_off, _, _, _) = st
    return jnp.stack([mx, max_j + 1, max_i + 1, max_ie + 1, gscore,
                      max_off], axis=1)


def _bsw_shear_dp(qT, tT, qlen, tlen, h0, w_in, Wh: int, W: int,
                  mat_a, mat_b, o_del: int, e_del: int, o_ins: int,
                  e_ins: int, zdrop: int, end_bonus: int, max_sc: int):
    """Diagonal-sheared banded extension for LONG pairs (the pacbio/ont2d
    tail class).  Same per-row formulas as _bsw_dp, but the DP state is
    stored along the BAND-OFFSET axis: frame index u at row i holds
    absolute query column j = i - Wh + u, so a row costs O(2w+2) vector
    lanes instead of O(qlen) — ~30x less work at 8kb reads with the
    default w=100 band (bandedSWA.cpp:147 clamps the band the same way).

    Layout is TRANSPOSED like the Pallas extension kernel: the band axis
    lives on SUBLANES (axis 0) and the P pairs are the 128 VPU lanes
    (axis 1), so the per-row query-window fetch is a dynamic slice along
    the MAJOR axis — a minor-axis dynamic slice re-materializes an
    O(P*qlen) select every row (measured ~1.5ms/row on v5e, 300x this
    version).

    The shear makes the diagonal move (i-1,j-1)->(i,j) purely vertical:
    _bsw_dp's column-shifted H storage (H[j] = H_matrix[i-1][j-1]) maps to
    an UNSHIFTED frame carry, while E (and the stale out-of-band cells)
    shift by one frame slot per row; the cell entering at u = W-1 is the
    row-0 initial value for its column, which no earlier row can have
    written (writes reach at most i + w + 1 < j_enter).  Rows run under a
    while_loop so a tile stops at its longest LIVE lane — lanes die at
    z-drop, row-max 0, or the first empty band row (i ~ qlen + w).
    Bit-identical to _bsw_dp / the scalar spec (tested).

    qT: int8[Qmax, P] (4-padded), tT: int8[Tmax, P]; Wh = the static band
    radius (>= every lane's clamped w), W = frame width >= 2*Wh + 2.
    Returns int32[P, 6]: score qle tle gtle gscore max_off."""
    Qmax, P = qT.shape
    Tmax = tT.shape[0]
    assert W >= 2 * Wh + 2
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    # query window source: qpadT[i + u, :] = q[j] for j = i - Wh + u.
    # The barrier forces the (possibly gather-producing) tile to be
    # materialized ONCE: otherwise XLA fuses it into the row loop and the
    # per-row window slice re-gathers O(P*W) elements every row (measured
    # 5.5ms/row at P=1024, Q=8192 — 300x this version).
    qpadT = jnp.concatenate(
        [jnp.full((Wh, P), 4, qT.dtype), qT, jnp.full((W, P), 4, qT.dtype)],
        axis=0)
    qpadT, tT = jax.lax.optimization_barrier((qpadT, tT))
    us = jnp.arange(W, dtype=I32)[:, None]                     # (W, 1)
    h0i = h0.astype(I32)
    qlen_r = qlen[None, :]                                     # (1, P)

    def init_col(j):
        # row-0 eh[] init (bandedSWA.cpp:139-146): H[0]=h0, decay, 0 past
        # qlen; j broadcasts against the (1, P) per-lane h0/qlen
        v = jnp.where(j == 0, h0i[None, :],
                      jnp.maximum(h0i[None, :] - oe_ins - (j - 1) * e_ins,
                                  0))
        return jnp.where((j >= 0) & (j <= qlen_r), v, 0).astype(I32)

    # initial frame: row 0 reads abs cols u - Wh
    H = init_col(us - Wh)
    E = jnp.zeros((W, P), I32)

    # per-lane band clamp (identical to _bsw_dp)
    max_ins = jnp.floor((qlen * max_sc + end_bonus - o_ins) / e_ins + 1.0) \
        .astype(I32)
    max_del = jnp.floor((qlen * max_sc + end_bonus - o_del) / e_del + 1.0) \
        .astype(I32)
    w = jnp.minimum(w_in, jnp.maximum(max_ins, 1))
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    mx = h0i
    max_i = jnp.full((P,), -1, I32)
    max_j = jnp.full((P,), -1, I32)
    max_ie = jnp.full((P,), -1, I32)
    gscore = jnp.full((P,), -1, I32)
    max_off = jnp.zeros((P,), I32)
    beg = jnp.zeros((P,), I32)
    end = qlen.astype(I32)
    done = tlen <= 0

    def cond(st):
        (i, H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
         done) = st
        return (i < Tmax) & jnp.any(~done & (i < tlen))

    def row_body(st):
        (i, H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
         done) = st
        act_row = ~done & (i < tlen)
        beg_r = jnp.maximum(beg, i - w)
        end_r = jnp.minimum(jnp.minimum(end, i + w + 1), qlen)
        jcols = (i - Wh) + us                                   # (W, 1)
        qrow = jax.lax.dynamic_slice_in_dim(qpadT, i, W, axis=0) \
            .astype(I32)                                        # (W, P)
        ti = jax.lax.dynamic_slice_in_dim(
            tT, jnp.minimum(i, Tmax - 1), 1, axis=0)[0].astype(I32)  # (P,)
        h1_0 = jnp.where(beg_r == 0,
                         jnp.maximum(h0i - (o_del + e_del * (i + 1)), 0),
                         0).astype(I32)

        band = (jcols >= beg_r[None, :]) & (jcols < end_r[None, :])
        s_ij = jnp.where((ti[None, :] >= 4) | (qrow >= 4), -1,
                         jnp.where(ti[None, :] == qrow, mat_a,
                                   -mat_b)).astype(I32)
        Mv = jnp.where(H != 0, H + s_ij, 0)
        u = jnp.where(band, jnp.maximum(Mv - oe_ins, 0) + jcols * e_ins,
                      NEG_BIG)
        upre = jnp.concatenate([jnp.full((1, P), NEG_BIG, I32),
                                jax.lax.cummax(u, axis=0)[:-1]], axis=0)
        fv = upre - jnp.maximum(jcols - 1, 0) * e_ins
        hv = jnp.maximum(jnp.maximum(Mv, E), fv)
        hv = jnp.where(band, hv, 0)
        m = jnp.max(hv, axis=0)
        is_max = band & (hv == m[None, :])
        mj = jnp.max(jnp.where(is_max, jcols, -1), axis=0)
        mj = jnp.where(act_row & (m > 0), mj, -1)
        # h1 at the band end: hv at abs col end_r - 1 (frame end_r-1-i+Wh)
        eidx = jnp.clip(end_r - 1 - i + Wh, 0, W - 1)
        h1_sel = jnp.max(jnp.where(us == eidx[None, :], hv, 0), axis=0)
        h1_end = jnp.where(end_r > beg_r, h1_sel, h1_0)
        Enew = jnp.maximum(E - e_del, jnp.maximum(Mv - oe_del, 0))

        # post-write frames in ROW-i coordinates (abs col j = i - Wh + u):
        # H_after[j] = h1_0 at j==beg_r else hv[j-1], for j in [beg_r,end_r]
        hv_sr = jnp.concatenate([hv[:1], hv[:-1]], axis=0)
        wr_h = act_row[None, :] & (jcols >= beg_r[None, :]) \
            & (jcols <= end_r[None, :])
        H_after = jnp.where(
            wr_h, jnp.where(jcols == beg_r[None, :], h1_0[None, :], hv_sr),
            H)
        wr_e = act_row[None, :] & band
        E_after = jnp.where(wr_e, Enew, E)
        E_after = jnp.where(act_row[None, :] & (jcols == end_r[None, :]),
                            0, E_after)

        # gscore bookkeeping when the row spans the full query
        full = act_row & (end_r == qlen)
        max_ie = jnp.where(full & (gscore <= h1_end), i, max_ie)
        gscore = jnp.where(full, jnp.maximum(gscore, h1_end), gscore)
        m = jnp.where(act_row, m, 0)
        mj = jnp.where(act_row, mj, -1)

        newly_done = act_row & (m == 0)
        upd = act_row & (m > mx)
        off = jnp.abs(mj - i)
        max_off = jnp.where(upd, jnp.maximum(max_off, off), max_off)
        mx2 = jnp.where(upd, m, mx)
        max_i = jnp.where(upd, i, max_i)
        max_j = jnp.where(upd, mj, max_j)
        if zdrop > 0:
            del_case = (i - max_i) > (mj - max_j)
            zd = jnp.where(
                del_case,
                mx - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop,
                mx - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop)
            newly_done = newly_done | (act_row & ~upd & ~(m == 0) & zd)
        mx = mx2

        # band shrink to the nonzero region over the post-write frames
        nz = (H_after != 0) | (E_after != 0)
        inA = band & nz
        first = jnp.min(jnp.where(inA, jcols, Qmax + Wh + 2), axis=0)
        beg_n = jnp.minimum(first, end_r)
        inB = (jcols >= beg_r[None, :]) & (jcols <= end_r[None, :]) & nz
        last = jnp.max(jnp.where(inB, jcols, beg_r[None, :] - 1), axis=0)
        end_n = jnp.minimum(last + 2, qlen)

        keep = act_row & ~newly_done
        beg = jnp.where(keep, beg_n, beg_r)
        end = jnp.where(keep, end_n, end_r)
        done = done | newly_done

        # shift to the row-(i+1) frame; the entering column is row-0 fresh
        enter = init_col(jnp.reshape(i + W - Wh, (1, 1)))
        enter = jnp.broadcast_to(enter, (1, P))
        H = jnp.concatenate([H_after[1:], enter], axis=0)
        E = jnp.concatenate([E_after[1:], jnp.zeros((1, P), I32)],
                            axis=0)
        return (i + 1, H, E, mx, max_i, max_j, max_ie, gscore, max_off,
                beg, end, done)

    st = (jnp.int32(0), H, E, mx, max_i, max_j, max_ie, gscore, max_off,
          beg, end, done)
    st = jax.lax.while_loop(cond, row_body, st)
    (_, _, _, mx, max_i, max_j, max_ie, gscore, max_off, _, _, _) = st
    return jnp.stack([mx, max_j + 1, max_i + 1, max_ie + 1, gscore,
                      max_off], axis=1)


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17))
def bsw_shear_kernel(q, t, qlen, tlen, h0, w_in, mat_a, mat_b,
                     Wh: int, W: int, o_del: int, e_del: int, o_ins: int,
                     e_ins: int, zdrop: int, end_bonus: int, max_sc: int,
                     _pad: int = 0):
    """Sheared-band extension over materialized tiles (test surface)."""
    return _bsw_shear_dp(q.T, t.T, qlen, tlen, h0, w_in, Wh, W, mat_a,
                         mat_b, o_del, e_del, o_ins, e_ins, zdrop,
                         end_bonus, max_sc)


@partial(jax.jit,
         static_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
                         22, 23, 24))
def bsw_shear_desc_kernel(ref, enc, qoff, qdir, qlen, toff, tdir, tlen, h0,
                          w_in, Wh: int, W: int, Qmax: int, Tmax: int,
                          mat_a: int, mat_b: int,
                          o_del: int, e_del: int, o_ins: int, e_ins: int,
                          zdrop: int, end_bonus: int, max_sc: int,
                          ref_packed: bool = False, _pad: int = 0):
    """Sheared-band extension from descriptors (the long tail of
    bsw_desc_kernel): sequences are gathered on device exactly as there —
    directly in the kernel's transposed (seq-position, lane) layout — then
    the banded DP runs over the 2*Wh+2-wide sheared frame."""
    N, L = enc.shape
    enc_flat = enc.reshape(-1).astype(jnp.int8)
    jidx = jnp.arange(Qmax, dtype=I32)[:, None]
    qpos = qoff[None, :] + qdir[None, :] * jidx
    qT = jnp.where(jidx < qlen[None, :],
                   enc_flat[jnp.clip(qpos, 0, N * L - 1)],
                   jnp.int8(4))
    from .device_index import take_ref
    iidx = jnp.arange(Tmax, dtype=jnp.int64)[:, None]
    tpos = toff[None, :] + tdir[None, :].astype(jnp.int64) * iidx
    tT = jnp.where(iidx < tlen[None, :],
                   take_ref(ref, tpos, ref_packed).astype(jnp.int8),
                   jnp.int8(4))
    return _bsw_shear_dp(qT, tT, qlen, tlen, h0, w_in, Wh, W, mat_a, mat_b,
                         o_del, e_del, o_ins, e_ins, zdrop, end_bonus,
                         max_sc)


# hard caps: pairs beyond this go to the host kernel (the reference's
# scalar tail class); actual tile dims are the batch maxima rounded up
QCAP, TCAP = 256, 608
MAX_BAND_TRY_DEV = 2   # band-doubling rounds (bwamem.cpp:51 MAX_BAND_TRY)

# long class (pacbio/ont2d): pairs beyond (QCAP, TCAP) with qlen under this
# run on the sheared-band kernel; rows stop at min(tlen, qlen + w + 2) (the
# first empty-band row kills the lane), so tlen needs no cap at all
LONG_QCAP = 32768
LONG_T_LADDER = (768, 1536, 3072, 6144, 12288, 24576, LONG_QCAP + 512)
LONG_Q_LADDER = (512, 1024, 2048, 4096, 8192, 16384, LONG_QCAP)


def long_classes(qls: np.ndarray, tls: np.ndarray, idxs, w: int) -> list:
    """(Q, T, idx_array) groups for the sheared long class, keyed by the
    EFFECTIVE row count min(tlen, qlen + w + 2) — rows past the last
    possible in-band row never run, so a tlen >> qlen pair is cheap."""
    idxs = np.asarray(idxs)
    eff = np.minimum(tls[idxs], qls[idxs] + w + 2)
    rung = np.searchsorted(LONG_T_LADDER, eff)
    out = []
    for r in range(len(LONG_T_LADDER) + 1):
        sel = idxs[rung == r]
        if not len(sel):
            continue
        qmax = int(qls[sel].max())
        Q = LONG_Q_LADDER[int(np.searchsorted(LONG_Q_LADDER, qmax))]
        if r < len(LONG_T_LADDER):
            T = LONG_T_LADDER[r]
        else:
            # a huge user -w can push eff past the top rung: one dynamic
            # rung (1024-quantized to bound compile variants)
            T = int(-(-int(eff[rung == r].max()) // 1024)) * 1024
        out.append((Q, T, sel))
    return out


def t_classes(qls: np.ndarray, tls: np.ndarray, idxs) -> list:
    """Split pair indices across the fixed (Q, T) shape ladders
    (sortPairsLenExt analog): per-T-rung groups, tiny groups merged
    upward so no dispatch runs nearly empty.  Returns [(Q, T, idx_array)].
    Shared by the object-path (_run) and array-path (run_arrays)
    dispatchers so the two cannot drift apart."""
    idxs = np.asarray(idxs)
    ladder = (96, 160, 224, 320, 448, TCAP)
    rung = np.searchsorted(ladder, tls[idxs])
    groups = []
    for r in range(len(ladder)):
        sel = idxs[rung == r]
        if len(sel):
            groups.append((r, sel))
    merged = []
    cur: list = []
    for i, (r, sel) in enumerate(groups):
        cur.append(sel)
        if sum(len(x) for x in cur) >= 256 or i == len(groups) - 1:
            merged.append((r, np.concatenate(cur)))
            cur = []
    out = []
    for r, sel in merged:
        qmax = int(qls[sel].max())
        Q = 127 if qmax <= 127 else 255 if qmax <= 255 else 383
        out.append((Q, ladder[r], sel))
    return out


def h0_cap_bucket(h0max: int) -> int:
    """Quantized static h0 bound (limits compile variants)."""
    for c in (256, 1024, 4096):
        if h0max <= c:
            return c
    return 1 << 30



class DeviceBSW:
    """Bucketed device dispatch for the extension pairs.

    When `encj` (the chunk's device-resident padded read grid) is attached
    by the backend, pairs carrying descriptors run through bsw_desc_kernel
    (sequences gathered on device); otherwise the materialized tiles are
    uploaded (bsw_kernel) — the path the synthetic-pair tests use."""

    def __init__(self, dfm, opt):
        import threading
        self.dfm = dfm
        self.opt = opt
        self.max_sc = max(opt.a, 1)
        # per-thread: pipeline workers process whole chunks concurrently,
        # each with its own device-resident read grid
        self._tls = threading.local()

    @property
    def encj(self):
        return getattr(self._tls, "encj", None)

    @encj.setter
    def encj(self, v):
        self._tls.encj = v

    def _run(self, pending, w, opt, end_bonus):
        n = len(pending)
        out = np.zeros((n, 6), np.int32)
        qls = np.fromiter(
            (p.qlen if p.qlen >= 0 else len(p.qer) for p in pending),
            np.int32, n)
        tls = np.fromiter(
            (p.tlen if p.tlen >= 0 else len(p.ref) for p in pending),
            np.int32, n)
        fits = (qls <= QCAP) & (tls <= TCAP)
        use_desc = self.encj is not None and all(
            p.qdir != 0 for p in pending)
        # long class: descriptor pairs beyond the short tiles run on the
        # sheared-band kernel (pacbio/ont2d); only qlen > LONG_QCAP (or a
        # chunk with no device read grid) still reaches the host kernel
        fits_long = (~fits & (qls <= LONG_QCAP)) if use_desc \
            else np.zeros(n, bool)
        host_idx = np.nonzero(~fits & ~fits_long)[0].tolist()
        from ..utils.profiling import PROF
        PROF.count("overflow.bsw_host_tail", len(host_idx), n)
        dev_idx = np.nonzero(fits)[0]
        long_idx = np.nonzero(fits_long)[0]
        # one tile sized to the batch maxima: a single kernel dispatch per
        # side instead of one per static bucket (DP rows = Tmax, so tight
        # Tmax also trims the row loop)
        from . import bucket_pow2, round_up
        buckets = []
        if len(dev_idx):
            # fixed (Q, T) shape ladders + target-length class split (see
            # t_classes): every distinct tile is one XLA compile, and the
            # row loop runs T iterations for every lane in the tile
            buckets = [((Q, T), sel.tolist())
                       for Q, T, sel in t_classes(qls, tls, dev_idx)]
        from .bsw_pallas import bsw_desc_pallas, pallas_ok
        use_pallas = pallas_ok()
        flights = []   # all buckets enqueued before ONE fetch
        for (Q, T), idxs in buckets:
            P = bucket_pow2(len(idxs), 128)
            if use_desc:
                if use_pallas:
                    P = round_up(P, 128)
                L = self.encj.shape[1]
                qoff = np.zeros((P,), np.int32)
                qdir = np.zeros((P,), np.int32)
                qlen = np.zeros((P,), np.int32)
                toff = np.zeros((P,), np.int64)
                tdir = np.zeros((P,), np.int32)
                tlen = np.zeros((P,), np.int32)
                h0 = np.zeros((P,), np.int32)
                for r, i in enumerate(idxs):
                    p = pending[i]
                    qoff[r] = p.seqid * L + p.qoff
                    qdir[r] = p.qdir
                    qlen[r] = qls[i]
                    toff[r] = p.toff
                    tdir[r] = p.tdir
                    tlen[r] = tls[i]
                    h0[r] = p.h0
                args = (self.dfm.ref, self.encj, jnp.asarray(qoff),
                        jnp.asarray(qdir), jnp.asarray(qlen),
                        jnp.asarray(toff), jnp.asarray(tdir),
                        jnp.asarray(tlen), jnp.asarray(h0),
                        jnp.full((P,), w, np.int32), Q, T,
                        opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins,
                        opt.e_ins, opt.zdrop, end_bonus, self.max_sc)
                if use_pallas:
                    res = bsw_desc_pallas(*args, self.dfm.ref_packed)
                else:
                    res = bsw_desc_kernel(
                        *args, self.dfm.ref_packed,
                        h0_cap_bucket(int(h0[: len(idxs)].max(initial=0))))
                flights.append((idxs, res))
                continue
            q = np.full((P, Q), 4, np.int8)
            t = np.full((P, T), 4, np.int8)
            qlen = np.zeros((P,), np.int32)
            tlen = np.zeros((P,), np.int32)
            h0 = np.zeros((P,), np.int32)
            for r, i in enumerate(idxs):
                p = pending[i]
                q[r, : len(p.qer)] = p.qer
                t[r, : len(p.ref)] = p.ref
                qlen[r] = len(p.qer)
                tlen[r] = len(p.ref)
                h0[r] = p.h0
            res = bsw_kernel(jnp.asarray(q), jnp.asarray(t),
                             jnp.asarray(qlen), jnp.asarray(tlen),
                             jnp.asarray(h0),
                             jnp.full((P,), w, np.int32),
                             opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins,
                             opt.e_ins, opt.zdrop, end_bonus, self.max_sc,
                             h0_cap_bucket(
                                 int(h0[: len(idxs)].max(initial=0))))
            flights.append((idxs, res))
        if len(long_idx):
            Wh = int(w)
            Wfr = round_up(2 * Wh + 2, 128)
            L = self.encj.shape[1]
            for Q, T, sel in long_classes(qls, tls, long_idx, Wh):
                P = bucket_pow2(len(sel), 64)
                qoff = np.zeros((P,), np.int32)
                qdir = np.zeros((P,), np.int32)
                qlen = np.zeros((P,), np.int32)
                toff = np.zeros((P,), np.int64)
                tdir = np.zeros((P,), np.int32)
                tlen = np.zeros((P,), np.int32)
                h0 = np.zeros((P,), np.int32)
                for r, i in enumerate(sel):
                    p = pending[i]
                    qoff[r] = p.seqid * L + p.qoff
                    qdir[r] = p.qdir
                    qlen[r] = qls[i]
                    toff[r] = p.toff
                    tdir[r] = p.tdir
                    tlen[r] = tls[i]
                    h0[r] = p.h0
                res = bsw_shear_desc_kernel(
                    self.dfm.ref, self.encj, jnp.asarray(qoff),
                    jnp.asarray(qdir), jnp.asarray(qlen),
                    jnp.asarray(toff), jnp.asarray(tdir),
                    jnp.asarray(tlen), jnp.asarray(h0),
                    jnp.full((P,), w, np.int32), Wh, Wfr, Q, T,
                    opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins,
                    opt.e_ins, opt.zdrop, end_bonus, self.max_sc,
                    self.dfm.ref_packed)
                flights.append((sel.tolist(), res))
        for (idxs, _), resh in zip(flights,
                                   jax.device_get([f[1] for f in flights])):
            out[np.array(idxs)] = resh[: len(idxs)]
        if host_idx:
            from ..align.extend import native_bsw_kernel_factory
            sub = [pending[i] for i in host_idx]
            # pairs produced under device_caps=(LONG_QCAP, inf) arrive
            # unmaterialized (ref/qer None); they must have been routed to
            # the device long class above.  A caps/use_desc mismatch (e.g.
            # a future producer emitting qdir==0 into the same batch) must
            # fail loudly at this boundary, not deep in the native kernel
            for p in sub:
                assert p.ref is not None and p.qer is not None, (
                    "unmaterialized pair reached the host tail kernel: "
                    f"qlen={p.qlen} tlen={p.tlen} qdir={p.qdir} "
                    "(device_caps/use_desc mismatch)")
            attr = "pen_clip5" if end_bonus == opt.pen_clip5 else "pen_clip3"
            res = native_bsw_kernel_factory(attr)(sub, w, opt)
            out[np.array(host_idx)] = res
        return out

    def left_kernel(self, pending, w, opt):
        return self._run(pending, w, opt, opt.pen_clip5)

    def right_kernel(self, pending, w, opt):
        return self._run(pending, w, opt, opt.pen_clip3)

    def run_arrays(self, desc: dict, w: int, opt, end_bonus: int
                   ) -> np.ndarray:
        """Array-driven dispatch for the native extension stage
        (hostrt.extension_batch): every pair is in-cap (qlen <= QCAP,
        tlen <= TCAP), descriptors arrive as flat numpy arrays — no
        per-pair Python objects.  qoff is read-local; the read-grid row
        base is added here.  Same shape ladders / class split as _run."""
        flights, out = self._enqueue_arrays(desc, w, opt, end_bonus)
        for (idxs, _), resh in zip(flights,
                                   jax.device_get([f[1] for f in flights])):
            out[idxs] = resh[: len(idxs)]
        return out

    def _enqueue_arrays(self, desc: dict, w: int, opt, end_bonus: int):
        from . import bucket_pow2, round_up
        encj = self.encj
        L = encj.shape[1]
        n = len(desc["qoff"])
        out = np.zeros((n, 6), np.int32)
        qls = desc["qlen"]
        tls = desc["tlen"]
        qoff_flat = desc["seqid"].astype(np.int64) * L + desc["qoff"]
        from .bsw_pallas import bsw_desc_pallas, pallas_ok
        use_pallas = pallas_ok()
        flights = []   # all rung groups enqueued before ONE fetch
        for Q, T, idxs in t_classes(qls, tls, np.arange(n)):
            P = bucket_pow2(len(idxs), 128)
            if use_pallas:
                P = round_up(P, 128)   # pairs = whole 128-lane programs

            def pad(a, dt):
                v = np.zeros((P,), dt)
                v[: len(idxs)] = a[idxs]
                return jnp.asarray(v)

            args = (self.dfm.ref, encj, pad(qoff_flat, np.int32),
                    pad(desc["qdir"], np.int32), pad(qls, np.int32),
                    pad(desc["toff"], np.int64), pad(desc["tdir"], np.int32),
                    pad(tls, np.int32), pad(desc["h0"], np.int32),
                    jnp.full((P,), w, np.int32), Q, T,
                    opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins,
                    opt.e_ins, opt.zdrop, end_bonus, self.max_sc)
            if use_pallas:
                res = bsw_desc_pallas(*args, self.dfm.ref_packed)
            else:
                res = bsw_desc_kernel(
                    *args, self.dfm.ref_packed,
                    h0_cap_bucket(int(desc["h0"][idxs].max(initial=0))))
            flights.append((idxs, res))
        return flights, out
