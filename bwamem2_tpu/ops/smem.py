"""Batched SMEM enumeration on device.

TPU-first reformulation of the reference's per-pivot bidirectional SMEM
algorithm (getSMEMsAllPosOneThread / OnePos / bwtSeedStrategy,
FMI_search.cpp:496-812) into data-parallel backward walks:

round 1 (min_intv=1): an SMEM is a supermaximal exact match.  For every end
position n, one lane walks the FM index backward from n until the interval
empties, yielding the leftmost start b(n); the SMEM set is exactly
{ [b(n), n] : b(n) < b(n+1), length >= min_seed_len }.  This turns the
reference's irregular per-pivot enumeration with head/tail compaction into
(reads x positions) independent lanes — a `lax.while_loop` over int64
vectors of gathers, ideal for HBM gather throughput.

round 2 (re-seeding, min_intv=s+1): per selected pivot, a forward pass
collects the distinct-interval prefixes [x..n_t] (candidate lanes), then each
candidate walks backward until its interval size drops below min_intv.  The
reference's per-column emit/dedup rules reduce to: group candidates by death
column; the longest candidate of each group emits (see ROUND2 NOTES in
align/seeding.py's spec); survivors emit their longest.

round 3: forward-only walks from every start; the data-dependent pivot chain
(next_x = stop+1) is replayed on the host over the per-start results.

All kernels return fixed-shape arrays; the host assembles the exact SMEM
tuple lists and verifies set-equality with the scalar oracle in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device_index import DeviceFMIndex, backward_ext_full, lf_step

I64 = jnp.int64


@partial(jax.jit, static_argnums=())
def round1_kernel(dfm: DeviceFMIndex, enc: jax.Array, lens: jax.Array):
    """Backward walk from every (read, end) lane until the interval empties.

    enc: int32[N, L] (4 = N/pad), lens: int32[N].
    Returns b (leftmost start, int32[N, L]), k, s (int64[N, L]) of [b, n]."""
    N, L = enc.shape
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (N, L))
    a0 = enc
    valid = (a0 < 4) & (pos < lens[:, None])
    a0c = jnp.where(valid, a0, 0).astype(jnp.int32)
    k = dfm.counts[a0c]
    s = dfm.counts[a0c + 1] - dfm.counts[a0c]
    b = jnp.where(valid, pos, pos + 1)  # empty-match start for invalid lanes
    col = pos - 1
    alive = valid

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        alive, col, k, s, b = st
        c = jnp.take_along_axis(enc, jnp.maximum(col, 0).astype(jnp.int32),
                                axis=1)
        ok = alive & (col >= 0) & (c < 4)
        cc = jnp.where(ok, c, 0).astype(jnp.int32)
        k2, s2 = lf_step(dfm, k, s, cc)
        ext = ok & (s2 > 0)
        k = jnp.where(ext, k2, k)
        s = jnp.where(ext, s2, s)
        b = jnp.where(ext, col, b)
        col = jnp.where(ext, col - 1, col)
        return ext, col, k, s, b

    alive, col, k, s, b = jax.lax.while_loop(cond, body,
                                             (alive, col, k, s, b))
    return b, k, s


@partial(jax.jit, static_argnums=(3, 4))
def round1_phase_kernel(dfm: DeviceFMIndex, enc: jax.Array, lens: jax.Array,
                        n_iters: int, lut_k: int = 0):
    """First n_iters backward steps for every (read, end) lane (fori, no
    convergence test).  Most lanes' intervals empty within ~20 steps on a
    mammalian genome; survivors continue in round1_tail_kernel over a
    compacted lane set — the TPU equivalent of the reference's head/tail
    compaction (getSMEMsAllPosOneThread, FMI_search.cpp:693-721).

    With lut_k > 0, lanes whose last-lut_k-char window is clean (no N, fully
    inside the read) start from the precomputed K-mer interval, skipping
    lut_k LF steps (index/klut.py)."""
    N, L = enc.shape
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (N, L))
    a0 = enc
    valid = (a0 < 4) & (pos < lens[:, None])
    a0c = jnp.where(valid, a0, 0).astype(jnp.int32)
    k = dfm.counts[a0c]
    s = dfm.counts[a0c + 1] - dfm.counts[a0c]
    b = jnp.where(valid, pos, pos + 1)
    col = pos - 1
    alive = valid

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
        lk = dfm.lut_k[code]
        ls = dfm.lut_s[code]
        use_lut = use_lut & (ls > 0)
        k = jnp.where(use_lut, lk, k)
        s = jnp.where(use_lut, ls, s)
        b = jnp.where(use_lut, pos - lut_k + 1, b)
        col = jnp.where(use_lut, pos - lut_k, col)

    def body(_, st):
        alive, col, k, s, b = st
        c = jnp.take_along_axis(enc, jnp.maximum(col, 0).astype(jnp.int32),
                                axis=1)
        ok = alive & (col >= 0) & (c < 4)
        cc = jnp.where(ok, c, 0).astype(jnp.int32)
        k2, s2 = lf_step(dfm, k, s, cc)
        ext = ok & (s2 > 0)
        k = jnp.where(ext, k2, k)
        s = jnp.where(ext, s2, s)
        b = jnp.where(ext, col, b)
        col = jnp.where(ext, col - 1, col)
        return ext, col, k, s, b

    alive, col, k, s, b = jax.lax.fori_loop(0, n_iters, body,
                                            (alive, col, k, s, b))
    return b, k, s, col, alive


@partial(jax.jit, static_argnums=())
def round1_tail_kernel(dfm: DeviceFMIndex, enc_rows: jax.Array,
                       col: jax.Array, k: jax.Array, s: jax.Array,
                       b: jax.Array):
    """Finish the surviving lanes (compacted): enc_rows int32[M, L] is each
    lane's read, col/k/s/b the lane state from the phase kernel."""
    alive = jnp.ones(col.shape, bool)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        alive, col, k, s, b = st
        c = jnp.take_along_axis(enc_rows, jnp.maximum(col, 0)[:, None]
                                .astype(jnp.int32), axis=1)[:, 0]
        ok = alive & (col >= 0) & (c < 4)
        cc = jnp.where(ok, c, 0).astype(jnp.int32)
        k2, s2 = lf_step(dfm, k, s, cc)
        ext = ok & (s2 > 0)
        k = jnp.where(ext, k2, k)
        s = jnp.where(ext, s2, s)
        b = jnp.where(ext, col, b)
        col = jnp.where(ext, col - 1, col)
        return ext, col, k, s, b

    st = jax.lax.while_loop(cond, body, (alive, col, k, s, b))
    return st[4], st[2], st[3]


def round1_emit(b, k, s, lens, min_seed_len):
    """Host-side emission filter for round-1 lanes (NumPy)."""
    b = np.asarray(b)
    k = np.asarray(k)
    s = np.asarray(s)
    N, L = b.shape
    pos = np.arange(L, dtype=np.int32)[None, :]
    bnext = np.concatenate([b[:, 1:], np.full((N, 1), L + 1, np.int32)],
                           axis=1)
    # lanes past the read end must not block their neighbor
    bnext = np.where(pos + 1 >= np.asarray(lens)[:, None], L + 1, bnext)
    emit = ((b <= pos) & (b < bnext)
            & (pos - b + 1 >= min_seed_len)
            & (pos < np.asarray(lens)[:, None]))
    return emit


@partial(jax.jit, static_argnums=())
def round3_kernel(dfm: DeviceFMIndex, enc: jax.Array, lens: jax.Array,
                  max_intv: jax.Array, min_seed_len: jax.Array):
    """Forward-only walk from every (read, start) lane
    (bwtSeedStrategyAllPosOneThread semantics).

    Returns per-lane: stop column (int32), emit flag, n, k, s."""
    N, L = enc.shape
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (N, L))
    a0 = enc
    valid = (a0 < 4) & (pos < lens[:, None])
    a0c = jnp.where(valid, a0, 0).astype(jnp.int32)
    k = dfm.counts[a0c]
    l = dfm.counts[3 - a0c]
    s = dfm.counts[a0c + 1] - dfm.counts[a0c]
    col = pos + 1
    # stop for invalid-start lanes is the start itself (next_x = x + 1)
    stop = pos
    emit = jnp.zeros((N, L), bool)
    n_out = pos
    k_out = k
    s_out = s
    alive = valid

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        alive, col, k, l, s, stop, emit, n_out, k_out, s_out = st
        inb = col < lens[:, None]
        c = jnp.take_along_axis(enc, jnp.minimum(col, L - 1)
                                .astype(jnp.int32), axis=1)
        ok = alive & inb & (c < 4)
        cc = jnp.where(ok, 3 - c, 0).astype(jnp.int32)
        # forward ext == backward ext on RC index with k/l swapped
        nl, nk, ns = backward_ext_full(dfm, l, k, s, cc)
        k = jnp.where(ok, nk, k)
        l = jnp.where(ok, nl, l)
        s = jnp.where(ok, ns, s)
        ln = col - pos + 1
        hit = ok & (s < max_intv) & (ln >= min_seed_len)
        emit = emit | (hit & (s > 0))
        n_out = jnp.where(hit, col, n_out)
        k_out = jnp.where(hit, k, k_out)
        s_out = jnp.where(hit, s, s_out)
        # stop at N (col), at hit (col); natural end -> len-1
        stop = jnp.where(alive & inb & (c >= 4), col, stop)
        stop = jnp.where(hit, col, stop)
        stop = jnp.where(alive & ~inb, lens[:, None] - 1, stop)
        alive = ok & ~hit
        col = jnp.where(alive, col + 1, col)
        return alive, col, k, l, s, stop, emit, n_out, k_out, s_out

    st = jax.lax.while_loop(cond, body, (alive, col, k, l, s, stop, emit,
                                         n_out, k_out, s_out))
    _, _, _, _, _, stop, emit, n_out, k_out, s_out = st
    return stop, emit, n_out, k_out, s_out


@partial(jax.jit, static_argnums=(4,))
def round2_forward_kernel(dfm: DeviceFMIndex, enc_p: jax.Array,
                          plen: jax.Array, min_intv: jax.Array, C: int):
    """Forward pass per pivot: collect candidate prefixes.

    enc_p: int32[P, L] the pivot's read suffix starting at the pivot column
    (enc_p[:, 0] = char at pivot), plen: remaining length.  Returns per pivot
    up to C candidates: n_off (end offset from pivot), k, l, s; count."""
    P, L = enc_p.shape
    a0 = enc_p[:, 0].astype(jnp.int32)
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
        c = enc_p[:, j].astype(jnp.int32)
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
    st = jax.lax.fori_loop(1, L, body, st)
    (cands, ncand, k, l, s, n, alive) = st
    # final push: surviving interval if s >= min_intv (incl. single-char case)
    push_final = valid & (s >= min_intv)
    cands, ncand = push(cands, ncand, push_final, n, k, l, s)
    cand_n, cand_k, cand_l, cand_s = cands
    return cand_n, cand_k, cand_l, cand_s, ncand


@partial(jax.jit, static_argnums=())
def round2_backward_kernel(dfm: DeviceFMIndex, enc_rev: jax.Array,
                           rlen: jax.Array, k: jax.Array, s: jax.Array,
                           min_intv: jax.Array):
    """Backward pass per candidate lane.

    enc_rev: int32[M, L] read prefix left of the pivot, REVERSED (enc_rev[:,0]
    = char at pivot-1), rlen: number of valid chars.  Walks until the interval
    size drops below min_intv; returns steps taken (death offset), final k/s,
    and whether the lane died (vs hit start/N)."""
    M, L = enc_rev.shape
    steps = jnp.zeros((M,), jnp.int32)
    col = jnp.zeros((M,), jnp.int32)
    alive = (rlen > 0) & (s > 0)
    died = jnp.zeros((M,), bool)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        alive, col, k, s, steps, died = st
        c = jnp.take_along_axis(enc_rev, jnp.minimum(col, L - 1)[:, None],
                                axis=1)[:, 0]
        ok = alive & (col < rlen) & (c < 4)
        cc = jnp.where(ok, c, 0).astype(jnp.int32)
        k2, s2 = lf_step(dfm, k, s, cc)
        ext = ok & (s2 >= min_intv)
        dies = ok & (s2 < min_intv)
        died = died | dies
        k = jnp.where(ext, k2, k)
        s = jnp.where(ext, s2, s)
        steps = jnp.where(ext, steps + 1, steps)
        col = jnp.where(ext, col + 1, col)
        alive = ext
        return alive, col, k, s, steps, died

    st = jax.lax.while_loop(cond, body, (alive, col, k, s, steps, died))
    _, _, k, s, steps, died = st
    return steps, k, s, died
