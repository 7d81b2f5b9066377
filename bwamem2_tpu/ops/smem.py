"""Batched SMEM enumeration on device.

TPU-first reformulation of the reference's per-pivot bidirectional SMEM
algorithm (getSMEMsAllPosOneThread / OnePos / bwtSeedStrategy,
FMI_search.cpp:496-812) into data-parallel backward walks:

round 1 (min_intv=1): an SMEM is a supermaximal exact match.  For every end
position n, one lane walks the FM index backward from n until the interval
empties, yielding the leftmost start b(n); the SMEM set is exactly
{ [b(n), n] : b(n) < b(n+1), length >= min_seed_len }.  This turns the
reference's irregular per-pivot enumeration with head/tail compaction into
(reads x positions) independent lanes of gathers, ideal for HBM gather
throughput.

All loops are `lax.fori_loop` with static trip counts (bounded by the padded
read length): a `lax.while_loop` whose cond reduces over the lanes costs a
device->host sync per iteration, which dwarfs the masked gather work of a
dead lane by orders of magnitude.  Finished lanes just ride along masked.

round 2 (re-seeding, min_intv=s+1): per selected pivot, a forward pass
collects the distinct-interval prefixes [x..n_t] (candidate lanes), then each
candidate walks backward until its interval size drops below min_intv.  The
reference's per-column emit/dedup rules reduce to: group candidates by death
column; the longest candidate of each group emits (see ROUND2 NOTES in
align/seeding.py's spec); survivors emit their longest.

round 3: the data-dependent pivot chain (forward-walk from x, emit at the
first hit, next_x = stop+1) is replayed ON DEVICE with one lane per read
(round3_replay_kernel).

All kernels return fixed-shape arrays; the host assembles the exact SMEM
tuple lists and verifies set-equality with the scalar oracle in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fori_unroll2
from .device_index import (DeviceFMIndex, backward_ext_full, lf_step,
                           lf_step32, take_counts)

I64 = jnp.int64


def _round1_walk(dfm: DeviceFMIndex, enc: jax.Array, lens: jax.Array,
                 lut_k: int, small: bool = False):
    """Backward walk from every (read, end) lane until the interval empties.

    enc: int{8,32}[N, L] (4 = N/pad), lens: int32[N].
    Returns b (leftmost start, int32[N, L]), k, s (int64[N, L]) of [b, n].

    One fori_loop of L masked steps; a lane's walk is at most its end
    position, so every lane finishes.  With lut_k > 0, lanes whose
    last-lut_k-char window is clean (no N, fully inside the read) start from
    the precomputed K-mer interval, skipping lut_k LF steps (index/klut.py)."""
    N, L = enc.shape
    enc = enc.astype(jnp.int32)
    # int32 intervals when the doubled genome fits (halves the loop-carried
    # state so it stays VMEM-resident through the walk)
    counts = dfm.counts.astype(jnp.int32) if small else dfm.counts
    lut_kt = dfm.lut_k.astype(jnp.int32) if small else dfm.lut_k
    lut_st = dfm.lut_s.astype(jnp.int32) if small else dfm.lut_s
    step = ((lambda k, s, a: lf_step32(dfm, counts, k, s, a)) if small
            else (lambda k, s, a: lf_step(dfm, k, s, a)))
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (N, L))
    a0 = enc
    valid = (a0 < 4) & (pos < lens[:, None])
    a0c = jnp.where(valid, a0, 0).astype(jnp.int32)
    k = take_counts(counts, a0c)
    s = take_counts(counts, a0c, 1) - k
    b = jnp.where(valid, pos, pos + 1)
    alive = valid
    use_lut = jnp.zeros((N, L), bool)

    if lut_k:
        # rolling K-mer codes + N detection over the window ending at pos
        code = jnp.zeros((N, L), jnp.int32)
        nbad = jnp.zeros((N, L), jnp.int32)
        for i in range(lut_k):
            sh = jnp.roll(a0c, i, axis=1)      # char at pos - i
            sh = jnp.where(pos - i >= 0, sh, 0)
            bad = jnp.roll((a0 >= 4).astype(jnp.int32), i, axis=1)
            bad = jnp.where(pos - i >= 0, bad, 1)
            code = code + (sh << (2 * i))      # base^i for offset i from end
            nbad = nbad + bad
        use_lut = valid & (nbad == 0) & (pos >= lut_k - 1)
        lk = lut_kt[code]
        ls = lut_st[code]
        use_lut = use_lut & (ls > 0)
        k = jnp.where(use_lut, lk, k)
        s = jnp.where(use_lut, ls, s)
        b = jnp.where(use_lut, pos - lut_k + 1, b)

    # Alive lanes consume exactly one column per step, in lockstep: at step
    # t, a (still-alive) lane at end position n reads enc[n - start_off - t]
    # where start_off is 1 (walk from scratch) or lut_k (LUT jump-start).
    # So the per-step "char at col" is a static roll-by-1 of a carried
    # shifted copy of the read — NO gather (take_along_axis is a gather,
    # and gathers are ~100x a roll on TPU).
    #
    # A lane's walk is at most its end position n, so at step t every
    # column < t is dead: the loop runs as 4 phases that statically DROP
    # the leading quarter of the columns at each boundary (their state is
    # frozen), cutting total work from L^2 to 0.625*L^2 lane-steps
    # regardless of the data.  (Rolling a narrowed slice wraps garbage
    # into its leftmost column only, and that lane is provably dead.)
    # the loop carry is kept as narrow as possible (int8 chars, int16
    # coordinates, int32/int64 intervals) so its working set stays on-chip
    start_off = jnp.where(use_lut, jnp.int32(lut_k), jnp.int32(1)) \
        .astype(jnp.int8)
    enc8 = enc.astype(jnp.int8)
    c_nl = jnp.roll(enc8, 1, axis=1)
    c_lut = jnp.roll(enc8, lut_k, axis=1) if lut_k else c_nl
    b = b.astype(jnp.int16)
    pos16 = pos.astype(jnp.int16)

    cuts = sorted({0, L // 4, L // 2, (3 * L) // 4, L})
    b_parts, k_parts, s_parts = [], [], []
    st = (alive, k, s, b, c_nl, c_lut)
    consts = (pos16, start_off, use_lut)

    def make_body(consts):
        pos_p, so_p, ul_p = consts

        def body2(t, st):
            alive, k, s, b, c_nl, c_lut = st
            col = (pos_p - so_p).astype(jnp.int32) - t
            c = jnp.where(ul_p, c_lut, c_nl)
            ok = alive & (col >= 0) & (c < 4)
            cc = jnp.where(ok, c, 0).astype(jnp.int32)
            k2, s2 = step(k, s, cc)
            ext = ok & (s2 > 0)
            k = jnp.where(ext, k2, k)
            s = jnp.where(ext, s2, s)
            b = jnp.where(ext, col.astype(jnp.int16), b)
            c_nl = jnp.roll(c_nl, 1, axis=1)
            c_lut = jnp.roll(c_lut, 1, axis=1) if lut_k else c_nl
            return ext, k, s, b, c_nl, c_lut
        return body2

    for lo, hi in zip(cuts[:-1], cuts[1:]):
        st = fori_unroll2(lo, hi, make_body(consts), st)
        if hi < L:
            drop = hi - lo
            b_parts.append(st[3][:, :drop])
            k_parts.append(st[1][:, :drop])
            s_parts.append(st[2][:, :drop])
            st = tuple(a[:, drop:] for a in st)
            consts = tuple(a[:, drop:] for a in consts)
    b_parts.append(st[3])
    k_parts.append(st[1])
    s_parts.append(st[2])
    return (jnp.concatenate(b_parts, axis=1).astype(jnp.int32),
            jnp.concatenate(k_parts, axis=1).astype(jnp.int64),
            jnp.concatenate(s_parts, axis=1).astype(jnp.int64))


@partial(jax.jit, static_argnums=(3, 4))
def round1_kernel(dfm: DeviceFMIndex, enc: jax.Array, lens: jax.Array,
                  lut_k: int = 0, small: bool = False):
    """Full-grid round-1 walk (see _round1_walk)."""
    return _round1_walk(dfm, enc, lens, lut_k, small)


@partial(jax.jit, static_argnums=(3, 5, 6))
def round1_compact_kernel(dfm: DeviceFMIndex, enc: jax.Array,
                          lens: jax.Array, lut_k: int,
                          min_seed_len: jax.Array, cap: int,
                          small: bool = False):
    """Round-1 walk + on-device emission + per-read compaction.

    The (N, L) result grids never leave HBM: the SMEM emission rule
    (b[n] < b[n+1], length >= min_seed_len) is applied on device and the
    emitted columns are compacted into `cap` slots per read, so the host
    transfer is O(emitted SMEMs), not O(N*L) int64 grids — which matters
    both over PCIe and enormously over a tunneled device.

    Returns cnt int32[N] (TRUE emit count, may exceed cap — caller falls
    back for such reads), n int16[N,cap], b int16[N,cap], s int32[N,cap]
    (clamped), k int64[N,cap]."""
    N, L = enc.shape
    b, k, s = _round1_walk(dfm, enc, lens, lut_k, small)
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (N, L))
    bnext = jnp.concatenate(
        [b[:, 1:], jnp.full((N, 1), L + 1, b.dtype)], axis=1)
    bnext = jnp.where(pos + 1 >= lens[:, None], L + 1, bnext)
    emit = ((b <= pos) & (b < bnext)
            & (pos - b + 1 >= min_seed_len)
            & (pos < lens[:, None]))
    cnt = jnp.sum(emit, axis=1, dtype=jnp.int32)
    key = jnp.where(emit, pos, pos + L)
    order = jnp.argsort(key, axis=1)[:, :cap].astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    slot_ok = jnp.arange(cap, dtype=jnp.int32)[None, :] < cnt[:, None]
    n_out = jnp.where(slot_ok, order, -1).astype(jnp.int16)
    b_out = jnp.where(slot_ok, take(b), -1).astype(jnp.int16)
    s_out = jnp.where(slot_ok, jnp.minimum(take(s), 2**31 - 1),
                      0).astype(jnp.int32)
    k_out = jnp.where(slot_ok, take(k), 0)
    return cnt, n_out, b_out, s_out, k_out


@partial(jax.jit, static_argnums=(5,))
def round3_replay_kernel(dfm: DeviceFMIndex, enc: jax.Array,
                         lens: jax.Array, max_intv: jax.Array,
                         min_seed_len: jax.Array, cap: int):
    """Round 3 with the pivot chain replayed ON DEVICE, one lane per READ.

    bwtSeedStrategyAllPosOneThread's host loop is `x = 0; while x < len:
    forward-walk from x; emit at first hit; x = stop + 1` — sequential per
    read but independent across reads.  Running it as N read-lanes (instead
    of N*L position-lanes + host replay) does 64x less gather work and
    returns only the <= cap emitted seeds per read, so nothing O(N*L)
    crosses the device->host link.

    min_seed_len is passed as opt.min_seed_len + 1 (hit needs len > min).
    cap must be >= L // (min_seed_len + 1) + 1 so it cannot overflow.

    Returns nout int32[N], x int16[N,cap], n int16[N,cap], s int32[N,cap]
    (clamped), k int64[N,cap]."""
    N, L = enc.shape
    enc = enc.astype(jnp.int32)
    x = jnp.zeros((N,), jnp.int32)
    col = jnp.zeros((N,), jnp.int32)
    k = jnp.zeros((N,), I64)
    l = jnp.zeros((N,), I64)
    s = jnp.zeros((N,), I64)
    seg = jnp.zeros((N,), bool)
    nout = jnp.zeros((N,), jnp.int32)
    out_x = jnp.full((N, cap), -1, jnp.int16)
    out_n = jnp.full((N, cap), -1, jnp.int16)
    out_s = jnp.zeros((N, cap), jnp.int32)
    out_k = jnp.zeros((N, cap), I64)
    slot_iota = jnp.arange(cap, dtype=jnp.int32)[None, :]

    def body(_, st):
        x, col, k, l, s, seg, nout, out_x, out_n, out_s, out_k = st
        done = x >= lens
        # -- lanes not in a segment: try to start one at x --
        starting = ~done & ~seg
        c0 = jnp.take_along_axis(
            enc, jnp.clip(x, 0, L - 1)[:, None], axis=1)[:, 0]
        start_ok = starting & (c0 < 4)
        x = jnp.where(starting & ~start_ok, x + 1, x)   # N at x: next_x=x+1
        c0c = jnp.where(start_ok, c0, 0)
        k = jnp.where(start_ok, dfm.counts[c0c], k)
        l = jnp.where(start_ok, dfm.counts[3 - c0c], l)
        s = jnp.where(start_ok, dfm.counts[c0c + 1] - dfm.counts[c0c], s)
        col = jnp.where(start_ok, x + 1, col)
        # -- lanes already in a segment: advance one column --
        adv = ~done & seg
        inb = col < lens
        c = jnp.take_along_axis(
            enc, jnp.clip(col, 0, L - 1)[:, None], axis=1)[:, 0]
        # walked off the read end: stop = len-1 -> next_x = len (lane done)
        end_nat = adv & ~inb
        x = jnp.where(end_nat, lens, x)
        # N at col: stop = col -> next_x = col + 1
        end_n = adv & inb & (c >= 4)
        x = jnp.where(end_n, col + 1, x)
        ok = adv & inb & (c < 4)
        cc = jnp.where(ok, 3 - c, 0)
        nl, nk, ns = backward_ext_full(dfm, l, k, s, cc)
        k = jnp.where(ok, nk, k)
        l = jnp.where(ok, nl, l)
        s = jnp.where(ok, ns, s)
        ln = col - x + 1
        hit = ok & (s < max_intv) & (ln >= min_seed_len)
        do_emit = hit & (s > 0)
        onehot = (slot_iota == jnp.clip(nout, 0, cap - 1)[:, None]) \
            & do_emit[:, None]
        out_x = jnp.where(onehot, x[:, None].astype(jnp.int16), out_x)
        out_n = jnp.where(onehot, col[:, None].astype(jnp.int16), out_n)
        out_s = jnp.where(
            onehot, jnp.minimum(s, 2**31 - 1)[:, None].astype(jnp.int32),
            out_s)
        out_k = jnp.where(onehot, k[:, None], out_k)
        nout = nout + do_emit.astype(jnp.int32)
        # hit: stop = col -> next_x = col + 1
        x = jnp.where(hit, col + 1, x)
        col = jnp.where(ok & ~hit, col + 1, col)
        seg = jnp.where(adv, ok & ~hit, seg)
        seg = jnp.where(start_ok, True, seg)
        return x, col, k, l, s, seg, nout, out_x, out_n, out_s, out_k

    st = (x, col, k, l, s, seg, nout, out_x, out_n, out_s, out_k)
    # while-exit: typical chains finish after ~1.1*L of the 2L+2 bound
    SMAX = 2 * L + 2

    def cond(c_st):
        return (c_st[0] < SMAX) & jnp.any(c_st[1][0] < lens)

    def body16(c_st):
        t0, inner = c_st
        inner = fori_unroll2(0, 16, lambda i, s_: body(t0 + i, s_), inner)
        return (t0 + jnp.int32(16), inner)

    st = jax.lax.while_loop(cond, body16, (jnp.int32(0), st))[1]
    return st[6], st[7], st[8], st[9], st[10]


@partial(jax.jit, static_argnums=(3,))
def round1_chain_kernel(dfm: DeviceFMIndex, enc: jax.Array,
                        lens: jax.Array, cap: int):
    """Round-1 pivot-chain discovery, one lane per READ.

    The reference's round 1 is a sequential pivot chain per read
    (getSMEMsAllPosOneThread, FMI_search.cpp:672-724): pivot x forward-walks
    until the interval empties (stop j -> next pivot = j), an N stops the
    segment (next pivot = j+1), a clean run to the end finishes the read.
    Discovering the chain costs ~2L lane-steps per read; the per-pivot
    candidate collection + backward walks then run through the round-2
    kernels (round2_forward/backward_kernel with min_intv=1).  Total LF
    work is O(L * pivots) instead of the O(0.625 L^2) per-end grid — the
    difference is ~10x at 150bp on low-error reads.

    Returns npiv int32[N] (true pivot count; > cap -> caller falls back)
    and x int16[N, cap]."""
    N, L = enc.shape
    enc = enc.astype(jnp.int32)
    x = jnp.zeros((N,), jnp.int32)
    col = jnp.zeros((N,), jnp.int32)
    k = jnp.zeros((N,), I64)
    l = jnp.zeros((N,), I64)
    s = jnp.zeros((N,), I64)
    seg = jnp.zeros((N,), bool)
    npiv = jnp.zeros((N,), jnp.int32)
    out_x = jnp.full((N, cap), -1, jnp.int16)
    slot_iota = jnp.arange(cap, dtype=jnp.int32)[None, :]

    def body(_, st):
        x, col, k, l, s, seg, npiv, out_x = st
        done = x >= lens
        # -- lanes not in a segment: try to start a pivot at x --
        starting = ~done & ~seg
        c0 = jnp.take_along_axis(
            enc, jnp.clip(x, 0, L - 1)[:, None], axis=1)[:, 0]
        start_ok = starting & (c0 < 4)
        x = jnp.where(starting & ~start_ok, x + 1, x)   # N at x: next_x=x+1
        # emit the pivot
        onehot = (slot_iota == jnp.clip(npiv, 0, cap - 1)[:, None]) \
            & start_ok[:, None]
        out_x = jnp.where(onehot, x[:, None].astype(jnp.int16), out_x)
        npiv = npiv + start_ok.astype(jnp.int32)
        c0c = jnp.where(start_ok, c0, 0)
        k = jnp.where(start_ok, dfm.counts[c0c], k)
        l = jnp.where(start_ok, dfm.counts[3 - c0c], l)
        s = jnp.where(start_ok, dfm.counts[c0c + 1] - dfm.counts[c0c], s)
        col = jnp.where(start_ok, x + 1, col)
        # -- lanes in a segment: advance one column --
        adv = ~done & seg
        inb = col < lens
        c = jnp.take_along_axis(
            enc, jnp.clip(col, 0, L - 1)[:, None], axis=1)[:, 0]
        # clean run to the read end: next_x = len (lane done)
        end_nat = adv & ~inb
        x = jnp.where(end_nat, lens, x)
        # N at col: next_x = col + 1
        end_n = adv & inb & (c >= 4)
        x = jnp.where(end_n, col + 1, x)
        ok = adv & inb & (c < 4)
        cc = jnp.where(ok, 3 - c, 0)
        nl, nk, ns = backward_ext_full(dfm, l, k, s, cc)
        # interval empties at col: next_x = col (re-read this column)
        dies = ok & (ns < 1)
        x = jnp.where(dies, col, x)
        grow = ok & ~dies
        k = jnp.where(grow, nk, k)
        l = jnp.where(grow, nl, l)
        s = jnp.where(grow, ns, s)
        col = jnp.where(grow, col + 1, col)
        seg = jnp.where(adv, grow, seg)
        seg = jnp.where(start_ok, True, seg)
        return x, col, k, l, s, seg, npiv, out_x

    st = (x, col, k, l, s, seg, npiv, out_x)
    st = fori_unroll2(0, 2 * L + 2, body, st)
    return st[6], st[7]


@partial(jax.jit, static_argnums=(5,))
def round2_forward_kernel(dfm: DeviceFMIndex, enc: jax.Array,
                          rid: jax.Array, x: jax.Array,
                          min_intv: jax.Array, C: int):
    """Forward pass per pivot: collect candidate prefixes.

    enc: the device-resident padded read grid int8[N, L] (pad char 4 marks
    the read end, so no separate length array is needed); rid/x int32[P]:
    pivot read row and column.  Chars are fetched straight from the grid —
    pivot sequences are never re-sliced on the host or re-uploaded.
    Returns per pivot up to C candidates: n_off (end offset from pivot),
    k, l, s; count."""
    N, L = enc.shape
    P = rid.shape[0]
    enc_flat = enc.reshape(-1).astype(jnp.int32)
    base = rid * L + x

    def char_at(off):
        idx = jnp.clip(base + off, 0, N * L - 1)
        return enc_flat[idx]

    a0 = char_at(0)
    plen = jnp.where(rid >= 0, L - x, 0)  # chars beyond the read are 4
    valid = (a0 < 4) & (plen > 0)
    a0c = jnp.where(valid, a0, 0)
    k0 = dfm.counts[a0c]
    l0 = dfm.counts[3 - a0c]
    s0 = dfm.counts[a0c + 1] - dfm.counts[a0c]

    cand_n = jnp.full((P, C), -1, jnp.int32)
    cand_k = jnp.zeros((P, C), I64)
    cand_l = jnp.zeros((P, C), I64)
    cand_s = jnp.zeros((P, C), I64)
    ncand = jnp.zeros((P,), jnp.int32)

    def push(cands, ncand, do, n, k, l, s):
        cand_n, cand_k, cand_l, cand_s = cands
        idx = jnp.clip(ncand, 0, C - 1)
        onehot = (jnp.arange(C, dtype=jnp.int32)[None, :] == idx[:, None]) \
            & do[:, None]
        cand_n = jnp.where(onehot, n[:, None], cand_n)
        cand_k = jnp.where(onehot, k[:, None], cand_k)
        cand_l = jnp.where(onehot, l[:, None], cand_l)
        cand_s = jnp.where(onehot, s[:, None], cand_s)
        ncand = ncand + do.astype(jnp.int32)
        return (cand_n, cand_k, cand_l, cand_s), ncand

    def body(j, st):
        (cands, ncand, k, l, s, n, alive) = st
        c = char_at(j)
        ok = alive & (j < plen) & (c < 4)
        cc = jnp.where(ok, 3 - c, 0)
        nl, nk, ns = backward_ext_full(dfm, l, k, s, cc)
        # push previous interval when s changes (s_neq_mask trick)
        push_prev = ok & (ns != s)
        cands, ncand = push(cands, ncand, push_prev, n, k, l, s)
        dead = ok & (ns < min_intv)
        grow = ok & (ns >= min_intv)
        k = jnp.where(grow, nk, k)
        l = jnp.where(grow, nl, l)
        s = jnp.where(grow, ns, s)
        n = jnp.where(grow, jnp.int32(j), n)
        alive = alive & ok & ~dead
        return (cands, ncand, k, l, s, n, alive)

    cands = (cand_n, cand_k, cand_l, cand_s)
    n_init = jnp.zeros((P,), jnp.int32)
    st = (cands, ncand, k0, l0, s0, n_init, valid)
    st = fori_unroll2(1, L, body, st)
    (cands, ncand, k, l, s, n, alive) = st
    # final push: surviving interval if s >= min_intv (incl. single-char case)
    push_final = valid & (s >= min_intv)
    cands, ncand = push(cands, ncand, push_final, n, k, l, s)
    cand_n, cand_k, cand_l, cand_s = cands
    return cand_n.astype(jnp.int16), cand_k, cand_l, cand_s, ncand


@partial(jax.jit, static_argnums=(9,))
def round2_backward_kernel(dfm: DeviceFMIndex, enc: jax.Array,
                           ridp: jax.Array, xp: jax.Array,
                           ck: jax.Array, cs: jax.Array,
                           piv_idx: jax.Array, slot_idx: jax.Array,
                           min_intv: jax.Array, steps_max: int = 0):
    """Backward pass per candidate lane.

    enc: the device-resident padded read grid int8[N, L]; ridp/xp int32[P]:
    per-PIVOT read row and pivot column (a pad pivot has xp == 0, making its
    lanes dead).  piv_idx/slot_idx int32[M] map each lane to its pivot and
    forward-candidate slot; the lane's start interval is gathered on device
    from the forward pass's device-resident candidate grids (k =
    ck[piv, slot]), and chars come straight from the read grid — nothing is
    re-sliced on the host or re-uploaded.  Walks until the interval size
    drops below min_intv; returns steps taken (death offset), final k/s,
    and whether the lane died (vs hit start/N).

    steps_max > 0 runs only that many lockstep steps and also returns the
    alive mask: most lanes die within ~24 LF steps, so the caller runs a
    short first phase over all lanes, then re-dispatches only the (rare)
    survivors through round2_backward_resume_kernel — a fraction of the
    full-L lockstep gather work."""
    N, L = enc.shape
    k = ck[piv_idx, slot_idx]
    s = cs[piv_idx, slot_idx]
    x = xp[piv_idx]
    mi = min_intv[piv_idx]
    M = piv_idx.shape[0]
    col = jnp.zeros((M,), jnp.int32)
    alive = (x > 0) & (s > 0)
    died = jnp.zeros((M,), bool)
    st = _bwd_walk(dfm, enc, ridp[piv_idx], x, mi, alive, col, k, s, died,
                   steps_max if steps_max > 0 else L)
    alive, col, k, s, died = st
    if steps_max > 0:
        return col, k, s, died, alive
    return col, k, s, died


@partial(jax.jit, static_argnums=(7,))
def round2_backward_resume_kernel(dfm: DeviceFMIndex, enc: jax.Array,
                                  rid: jax.Array, x: jax.Array,
                                  mi: jax.Array, col0: jax.Array,
                                  k0: jax.Array, L_steps: int,
                                  s0: jax.Array):
    """Continue compacted surviving lanes from (col0, k0, s0) to the end."""
    alive = jnp.ones(col0.shape, bool)
    died = jnp.zeros(col0.shape, bool)
    st = _bwd_walk(dfm, enc, rid, x, mi, alive, col0, k0, s0, died,
                   L_steps)
    alive, col, k, s, died = st
    return col, k, s, died


def _bwd_walk(dfm, enc, rid, x, mi, alive, col, k, s, died, n_steps: int,
              small: bool = False):
    """`small`: the doubled genome fits int32 — carry (k, s, mi) as int32
    and use the int32 occ path (occ_one32), roughly halving the per-step
    elementwise op cost that sits on top of the two row gathers."""
    N, L = enc.shape
    enc_flat = enc.reshape(-1).astype(jnp.int32)
    base = rid * L + x - 1
    if small:
        counts32 = dfm.counts.astype(jnp.int32)
        step = lambda k, s, a: lf_step32(dfm, counts32, k, s, a)
    else:
        step = lambda k, s, a: lf_step(dfm, k, s, a)

    def body(_, st):
        alive, col, k, s, died = st
        c = enc_flat[jnp.clip(base - col, 0, N * L - 1)]
        ok = alive & (col < x) & (c < 4)
        cc = jnp.where(ok, c, 0).astype(jnp.int32)
        k2, s2 = step(k, s, cc)
        ext = ok & (s2 >= mi)
        dies = ok & (s2 < mi)
        died = died | dies
        k = jnp.where(ext, k2, k)
        s = jnp.where(ext, s2, s)
        col = jnp.where(ext, col + 1, col)
        alive = ext
        return alive, col, k, s, died

    return fori_unroll2(0, n_steps, body, (alive, col, k, s, died))
