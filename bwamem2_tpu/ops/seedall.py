"""Fused seeding: all 3 SMEM rounds + SA resolution, ONE fetch per chunk.

The r4 pipeline ran seeding as ~10 host-orchestrated dispatches per chunk
(round-1 chain -> fetch pivots -> round-2 forward -> fetch counts -> flatten
candidates on host -> backward -> fetch -> resume -> fetch -> emit on host ->
select round-2 pivots on host -> repeat -> round 3 fetch -> python tuple
assembly -> SA-position expansion on host -> SA dispatch -> fetch coords).
On a tunneled device every one of those syncs costs ~27ms of latency plus
device->host bytes at ~25MB/s, and the host-side tuple assembly was ~40% of
wall (r4 VERDICT items 1/3).

This module keeps the whole pipeline device-resident: the host-side glue
(pivot flattening, candidate flattening, survivor compaction, emission-rule
grouping, round-2 pivot selection, SMEM merge-sort, max_occ position
sampling) is re-expressed as argsort-based compactions and segment scans on
device, chained across a few jitted stages with NO intermediate fetch; one
device_get at the end returns compact flat arrays sized by measured caps
(~10B/SMEM + 4B/coordinate).

Round 1 runs as ONE pass: the pivot-chain walk collects its per-pivot
forward candidates while it walks (the reference's own structure —
getSMEMsAllPosOneThread's prev[] array, FMI_search.cpp:520-570), logged
per step and flattened into backward-walk lanes.  Walk lanes compact
their survivors between phases on measured death-curve schedules, with
int32 interval arithmetic whenever the doubled genome fits int32.

Capacity policy (candidate counts are heavy-tailed — repeat-region pivots
reach p99~82 distinct interval sizes): reads or pivots that outrun a pool
or phase cap RETRY on device at the wide tier-2 caps; only tier-2 residue
falls back to the exact native oracle on the host (rt_smems_pivots /
rt_collect_smems_reads + rt_sa_entries), so the host patch path is cold
(0 events on the chr21 bench).

Behavioral spec match: mem_collect_smem's 3 rounds (bwamem.cpp:626-803,
FMI_search.cpp:496-812) and the max_occ SA sampling of mem_chain_seeds
(bwamem.cpp:876-898); output is tuple-for-tuple identical to
DeviceBackend.collect_smems + chain.sa_positions_batch (tested, including
every forced-overflow path).

Static caps per (N, L) chunk bucket (measured, chr21 bench shape: 2.2 r1
pivots, ~29 candidate walks, 7.7 SMEMs, ~20 SA positions per read):

  P1CAP   round-1 pivot slots per read      (pivot_cap(L))
  MCAP    round-1 walk lanes     = 40*N (uncapped heavy tail)
  C1      round-2 tier-1 candidate slots = 32
  MCAP2   round-2 walk lanes     = 24*N
  PT2     retry/tier-2 pivot lanes = max(N//4, 512)
  C2      tier-2 candidate slots = 192
  MT2     tier-2 walk lanes      = 8*N
  P2CAP   round-2 pivot lanes    = 2*N
  SCAP    merged SMEM slots      = 12*N
  OCAP    SA coordinate lanes    = 28*N
  OVCAP   host-oracle pivot list = 8192
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fori_unroll2
from .device_index import (DeviceFMIndex, _fetch_rows, backward_ext_full,
                           backward_ext_full32, bwt_char_occ, take_counts)
from .smem import _bwd_walk, round3_replay_kernel

I32 = jnp.int32
I64 = jnp.int64
BIG32 = jnp.int32(2**31 - 1)
BIG64 = jnp.int64(2**62)


def _count_compact(valid, cap: int):
    """Stable-compact `valid` lanes (in lane order) to `cap` slots.
    Returns (sel int32[cap] source indices, ok bool[cap], count int32)."""
    n = valid.shape[0]
    rank = jnp.arange(n, dtype=I32)
    key = jnp.where(valid, rank, BIG32)
    sel = jnp.argsort(key).astype(I32)
    if cap <= n:
        sel = sel[:cap]
    else:
        sel = jnp.concatenate([sel, jnp.zeros((cap - n,), I32)])
    count = jnp.sum(valid, dtype=I32)
    ok = jnp.arange(cap, dtype=I32) < count
    return sel, ok, count


@partial(jax.jit, static_argnums=(3, 4))
def _stage_chain_collect(dfm: DeviceFMIndex, enc, lens, P1: int,
                         narrow: bool):
    """Round-1 pivot-chain walk that COLLECTS the per-pivot forward
    candidates as it goes — the reference's actual single-pass structure
    (getSMEMsAllPosOneThread collects prev[] during the same forward walk,
    FMI_search.cpp:520-570), replacing the r5-early design's separate
    pivot-discovery pass + per-pivot forward re-walk (which paid the LF
    gather bill twice).

    One lane per read; candidate events are LOGGED per step into
    (SMAX, N) column grids (one contiguous dynamic-update-slice row per
    step — no per-slot one-hot scatter, no per-read capacity cap), then
    flattened by the caller.  A while-loop exits early once every lane
    finishes (typical chains end after ~1.1*L of the 2L+2 worst case).

    Push events mirror _fwd_phased for min_intv=1 exactly: the previous
    interval on every interval-size change (including the death step),
    and the final surviving interval at a natural end (read end / N);
    the death step's duplicate final push is skipped — the emission
    winner rule dedups it anyway (identical group, identical payload).

    Returns (npiv int32[N], px int16[N, P1],
             pushed bool[SMAX, N], pk, ps (uint32 when narrow else
             int64/uint32) [SMAX, N], pxl int16[SMAX, N],
             pnl int16[SMAX, N], ov_read bool[N])."""
    N, L = enc.shape
    SMAX = 2 * L + 18   # 2L+2 walk bound + 16 slack columns (while stride)
    encv = enc.astype(I32)
    KDT = jnp.uint32 if narrow else I64
    x = jnp.zeros((N,), I32)
    col = jnp.zeros((N,), I32)
    k = jnp.zeros((N,), I64)
    l = jnp.zeros((N,), I64)
    s = jnp.zeros((N,), I64)
    seg = jnp.zeros((N,), bool)
    npiv = jnp.zeros((N,), I32)
    out_x = jnp.full((N, P1), -1, jnp.int16)
    n_last = jnp.zeros((N,), I32)
    pushed = jnp.zeros((SMAX, N), bool)
    pk = jnp.zeros((SMAX, N), KDT)
    ps = jnp.zeros((SMAX, N), jnp.uint32)
    pxl = jnp.zeros((SMAX, N), jnp.int16)
    pnl = jnp.zeros((SMAX, N), jnp.int16)
    slot_iota = jnp.arange(P1, dtype=I32)[None, :]

    def step(t, st):
        (x, col, k, l, s, seg, npiv, out_x, n_last,
         pushed, pk, ps, pxl, pnl) = st
        done = x >= lens
        # -- lanes not in a segment: try to start a pivot at x --
        starting = ~done & ~seg
        c0 = jnp.take_along_axis(
            encv, jnp.clip(x, 0, L - 1)[:, None], axis=1)[:, 0]
        start_ok = starting & (c0 < 4)
        x = jnp.where(starting & ~start_ok, x + 1, x)
        onehot = (slot_iota == jnp.clip(npiv, 0, P1 - 1)[:, None]) \
            & start_ok[:, None]
        out_x = jnp.where(onehot, x[:, None].astype(jnp.int16), out_x)
        npiv = npiv + start_ok.astype(I32)
        c0c = jnp.where(start_ok, c0, 0)
        k = jnp.where(start_ok, dfm.counts[c0c], k)
        l = jnp.where(start_ok, dfm.counts[3 - c0c], l)
        s = jnp.where(start_ok, dfm.counts[c0c + 1] - dfm.counts[c0c], s)
        col = jnp.where(start_ok, x + 1, col)
        n_last = jnp.where(start_ok, x, n_last)
        # -- lanes in a segment: advance one column --
        adv = ~done & seg
        inb = col < lens
        c = jnp.take_along_axis(
            encv, jnp.clip(col, 0, L - 1)[:, None], axis=1)[:, 0]
        end_nat = adv & ~inb
        end_n = adv & inb & (c >= 4)
        ok = adv & inb & (c < 4)
        cc = jnp.where(ok, 3 - c, 0)
        nl_, nk, ns = backward_ext_full(dfm, l, k, s, cc)
        dies = ok & (ns < 1)
        grow = ok & ~dies
        # candidate push (pre-transition state): s-change / death -> the
        # previous interval; natural end -> the final interval
        push_ev = (ok & (ns != s)) | end_nat | end_n
        pushed = pushed.at[t].set(push_ev)
        pk = pk.at[t].set(k.astype(KDT))
        ps = ps.at[t].set(s.astype(jnp.uint32))
        pxl = pxl.at[t].set(x.astype(jnp.int16))
        pnl = pnl.at[t].set(n_last.astype(jnp.int16))
        # transitions
        x = jnp.where(end_nat, lens, x)
        x = jnp.where(end_n, col + 1, x)
        x = jnp.where(dies, col, x)
        n_last = jnp.where(grow, col, n_last)
        k = jnp.where(grow, nk, k)
        l = jnp.where(grow, nl_, l)
        s = jnp.where(grow, ns, s)
        col = jnp.where(grow, col + 1, col)
        seg = jnp.where(adv, grow, seg)
        seg = jnp.where(start_ok, True, seg)
        return (x, col, k, l, s, seg, npiv, out_x, n_last,
                pushed, pk, ps, pxl, pnl)

    init = (x, col, k, l, s, seg, npiv, out_x, n_last,
            pushed, pk, ps, pxl, pnl)

    def cond(st):
        return (st[0] < SMAX - 16) & jnp.any(st[1] < lens)

    def body16(st):
        t0, inner = st[0], st[1:]
        inner = fori_unroll2(0, 16, lambda i, s_: step(t0 + i, s_), inner)
        return (t0 + jnp.int32(16),) + inner

    st = jax.lax.while_loop(cond, body16, (jnp.int32(0),) + init)
    (_, x, col, k, l, s, seg, npiv, out_x, n_last,
     pushed, pk, ps, pxl, pnl) = st
    ov_read = npiv > P1
    return npiv, out_x, pushed, pk, ps, pxl, pnl, ov_read


@partial(jax.jit, static_argnums=(9, 10, 11))
def _stage_bwd_emit1(dfm: DeviceFMIndex, enc, pushed, pk, ps, pxl, pnl,
                     ov_read, msl, MCAP: int, L: int, small: bool = False):
    """Flatten the chain-collect candidate log, run the phased backward
    walks, and apply the emission winner rule — round 1's tier-1 in the
    single-pass design.

    Candidates that outrun the lane pool or a survivor phase cap flag
    their READ for the on-device retry pool (tier 2 over that read's
    pivots).  Returns (_Emits over MCAP lanes, retry_read bool[N])."""
    N, _L = enc.shape
    SMAX = pushed.shape[0]
    T = SMAX * N
    lane = jnp.arange(T, dtype=I32)
    rid_f = lane % N
    act = pushed.reshape(-1) & ~ov_read[rid_f]
    # read-major, walk-order rank
    rank = rid_f * SMAX + (lane // N)
    key = jnp.where(act, rank, BIG32)
    sel = jnp.argsort(key)[:MCAP].astype(I32)
    nact = jnp.sum(act, dtype=I32)
    ok = jnp.arange(MCAP, dtype=I32) < nact
    rid = jnp.where(ok, sel % N, 0)
    x = jnp.where(ok, pxl.reshape(-1)[sel].astype(I32), 0)
    n_abs = jnp.where(ok, pnl.reshape(-1)[sel].astype(I32), 0)
    k0 = jnp.where(ok, pk.reshape(-1)[sel].astype(I64), 0)
    s0 = jnp.where(ok, ps.reshape(-1)[sel].astype(I64), 0)
    # lanes beyond the pool: their reads retry
    lost_pool = act & (jnp.cumsum(act) > MCAP)
    retry = jnp.zeros((N,), I32).at[rid_f].max(
        lost_pool.astype(I32), mode="drop")

    mi = jnp.ones((MCAP,), I64)
    alive = ok & (x > 0) & (s0 > 0)
    # x == 0 pivots have no backward reach but still emit (walk len 0):
    # keep them as lanes with alive=False, col=0, died=False
    col, kf, sf, died, lost_res = _bwd_lanes(
        dfm, enc, rid, x, mi, k0, s0, alive, ok, MCAP, L, SCHED_T1, small)
    retry = retry.at[rid].max(lost_res.astype(I32), mode="drop")
    retry_read = retry.astype(bool)

    valid = ok & ~retry_read[rid] & ~ov_read[rid]
    m_abs = x - col
    ok_len = (n_abs - m_abs + 1) >= msl
    grp = (rid.astype(I64) * (L + 2) + x) * (L + 2) \
        + jnp.where(died, col + 1, 0)
    gkey = jnp.where(valid, grp * MCAP + jnp.arange(MCAP, dtype=I32),
                     BIG64)
    perm = jnp.argsort(gkey).astype(I32)
    g = grp[perm]
    v = valid[perm]
    last = jnp.concatenate([g[:-1] != g[1:], jnp.ones((1,), bool)]) & v
    return (_Emits(rid=rid[perm], m=m_abs[perm], n=n_abs[perm],
                   k=kf[perm], s=sf[perm], emit=last & ok_len[perm]),
            retry_read)


@partial(jax.jit, static_argnums=(3, 4))
def _stage_retry_reads(flag_read, npiv, px, P1: int, PT2: int):
    """Compact the flagged reads' round-1 pivots for the tier-2 retry
    pool.  Pivots beyond PT2 go to the host oracle (mi=1 entries get the
    round-2 re-seed derivation there, backend._patch_chunk)."""
    N = flag_read.shape[0]
    slot = jnp.arange(P1, dtype=I32)[None, :]
    act = (slot < jnp.minimum(npiv, P1)[:, None]) & flag_read[:, None]
    af = act.reshape(-1)
    sel, ok, _ = _count_compact(af, PT2)
    ridr = jnp.where(ok, (sel // P1).astype(I32), -1)
    xr = jnp.where(ok, px.reshape(-1)[sel].astype(I32), 0)
    lost = af & (jnp.cumsum(af) > PT2)
    lost_rid = jnp.broadcast_to(
        jnp.arange(N, dtype=I32)[:, None], (N, P1)).reshape(-1)
    lost_x = px.reshape(-1).astype(I32)
    return ridr, xr, jnp.ones((PT2,), I64), lost, lost_rid, lost_x


@dataclass
class _Emits:
    """Per-candidate-lane emission set in grouped-sort order."""
    rid: jax.Array    # int32[M]
    m: jax.Array      # int32[M]
    n: jax.Array      # int32[M]
    k: jax.Array      # int64[M]
    s: jax.Array      # int64[M]
    emit: jax.Array   # bool[M]


jax.tree_util.register_dataclass(_Emits,
                                 ["rid", "m", "n", "k", "s", "emit"], [])


# forward-walk survivor-compaction schedule: pivots' forward extensions
# are long-lived (57% alive after 32 cols, 43% after 64 — flat tail), so
# only two coarse phases pay off; tier-2 pools are too small to bother
# (schedule=None runs one full-length phase).
SCHED_FWD = ((32, 2), (32, 3))


def _fwd_phased(dfm: DeviceFMIndex, enc, ridp, xp, mip, C: int,
                schedule=SCHED_FWD, small: bool = False):
    """Forward candidate collection (round2_forward_kernel semantics) with
    survivor compaction between column phases.  The walk is lockstep in the
    column offset j for every lane, so phases split the global j range and
    compact the still-alive pivot lanes between them.  Pivots whose lanes
    are lost to a phase cap are flagged for retry (exactness preserved).

    Returns (cand_n int32[P,C], ck, cs int64[P,C], ncand int32[P],
    ov_fwd bool[P])."""
    N, L = enc.shape
    P = ridp.shape[0]
    enc_flat = enc.reshape(-1).astype(I32)
    NL = N * L

    base = ridp * L + xp
    a0 = enc_flat[jnp.clip(base, 0, NL - 1)]
    plen = jnp.where(ridp >= 0, L - xp, 0)
    valid0 = (a0 < 4) & (plen > 0)
    a0c = jnp.where(valid0, a0, 0)
    # int32 interval arithmetic when the doubled genome fits: the fwd
    # pass's per-step cost is 2 occ_all4 gathers plus ~100 elementwise
    # ops, and halving the element width halves the latter
    KDT = I32 if small else I64
    counts = dfm.counts.astype(KDT)
    if small:
        bext = lambda l_, k_, s_, a_: backward_ext_full32(
            dfm, counts, l_, k_, s_, a_)
    else:
        bext = lambda l_, k_, s_, a_: backward_ext_full(dfm, l_, k_, s_,
                                                        a_)
    k = counts[a0c]
    l = counts[3 - a0c]
    s = counts[a0c + 1] - counts[a0c]
    n = jnp.zeros((P,), I32)
    alive = valid0
    cn = jnp.full((P, C), -1, I32)
    ck = jnp.zeros((P, C), KDT)
    cl = jnp.zeros((P, C), KDT)
    cs = jnp.zeros((P, C), KDT)
    nc = jnp.zeros((P,), I32)
    mi0 = mip.astype(KDT)
    mi = mi0
    ov_fwd = jnp.zeros((P,), I32)

    def push(cands, nc, do, n, k, l, s):
        cn, ck, cl, cs = cands
        C_ = cn.shape[1]
        idx = jnp.clip(nc, 0, C_ - 1)
        onehot = (jnp.arange(C_, dtype=I32)[None, :] == idx[:, None]) \
            & do[:, None]
        cn = jnp.where(onehot, n[:, None], cn)
        ck = jnp.where(onehot, k[:, None], ck)
        cl = jnp.where(onehot, l[:, None], cl)
        cs = jnp.where(onehot, s[:, None], cs)
        return (cn, ck, cl, cs), nc + do.astype(I32)

    def body(j, st):
        (cands, nc, k, l, s, n, alive, base, plen, mi) = st
        c = enc_flat[jnp.clip(base + j, 0, NL - 1)]
        ok = alive & (j < plen) & (c < 4)
        cc = jnp.where(ok, 3 - c, 0)
        nl_, nk, ns = bext(l, k, s, cc)
        push_prev = ok & (ns != s)
        cands, nc = push(cands, nc, push_prev, n, k, l, s)
        dead = ok & (ns < mi)
        grow = ok & (ns >= mi)
        k = jnp.where(grow, nk, k)
        l = jnp.where(grow, nl_, l)
        s = jnp.where(grow, ns, s)
        n = jnp.where(grow, jnp.int32(j), n)
        alive = grow
        return (cands, nc, k, l, s, n, alive, base, plen, mi)

    # banked P-space outputs + live (compacted) lane state
    out = dict(cn=cn, ck=ck, cs=cs, nc=nc, k=k, s=s, n=n)
    src = jnp.arange(P, dtype=I32)
    st = ((cn, ck, cl, cs), nc, k, l, s, n, alive, base, plen, mi)
    j0 = 1
    bounds = []
    for steps, div in (schedule or ()):
        bounds.append((j0, min(j0 + steps, L), max(P // div, 64)))
        j0 = min(j0 + steps, L)
    if j0 < L:
        bounds.append((j0, L, None))
    for lo, hi, cap in bounds:
        st = fori_unroll2(lo, hi, body, st)
        (cands, nc, k, l, s, n, alive, base, plen, mi) = st
        cn, ck, cl, cs = cands
        for nm, v in (("cn", cn), ("ck", ck), ("cs", cs), ("nc", nc),
                      ("k", k), ("s", s), ("n", n)):
            out[nm] = out[nm].at[src].set(v, mode="drop")
        if cap is None or hi >= L:
            break
        lost = alive & (jnp.cumsum(alive) > cap)
        ov_fwd = ov_fwd.at[src].max(lost.astype(I32), mode="drop")
        sel, okc, _ = _count_compact(alive & ~lost, cap)
        src = jnp.where(okc, src[sel], P)
        st = ((cn[sel], ck[sel], cl[sel], cs[sel]), nc[sel], k[sel],
              l[sel], s[sel], n[sel], okc, base[sel], plen[sel], mi[sel])
    # final push of the surviving interval (incl. the single-char case)
    push_final = valid0 & (out["s"] >= mi0)
    dummy_l = jnp.zeros((P, C), KDT)
    (cn, ck, _, cs), nc = push(
        (out["cn"], out["ck"], dummy_l, out["cs"]), out["nc"], push_final,
        out["n"], out["k"], jnp.zeros((P,), KDT), out["s"])
    return cn, ck, cs, nc, ov_fwd.astype(bool)


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _stage_round(dfm: DeviceFMIndex, enc, ridp, xp, mip, ov_read,
                 C: int, MCAP: int, schedule=None, small: bool = False,
                 msl=None):
    """One full per-pivot round: forward candidate collection, candidate
    flattening, two-phase backward walks, emission-rule winner selection —
    the device-resident replay of backend._round2.

    Returns (_Emits over MCAP lanes, ov_piv bool[P]: pivots whose forward
    candidates, candidate lanes, or resume slots overflowed — their device
    emissions are suppressed; the caller retries them at tier 2 or hands
    them to the host oracle)."""
    N, L = enc.shape
    P = ridp.shape[0]
    cand_n, ck, cs, ncand, ov_fwd = _fwd_phased(
        dfm, enc, ridp, xp, mip, C, SCHED_FWD if P >= 4096 else None,
        small)
    ov_cand = (ncand > C) | ov_fwd
    ncl = jnp.where(ov_cand, 0, jnp.minimum(ncand, C))
    endpos = jnp.cumsum(ncl)
    ov_lane = endpos > MCAP
    slot = jnp.arange(C, dtype=I32)[None, :]
    act = slot < ncl[:, None]
    sel, ok, _ = _count_compact(act.reshape(-1), MCAP)
    piv_idx = jnp.where(ok, (sel // C).astype(I32), P - 1)
    slot_idx = jnp.where(ok, (sel % C).astype(I32), 0)

    col, k, s, died, ov_res = _bwd_phased(
        dfm, enc, ridp, xp, mip, ck, cs, piv_idx, slot_idx, ok, MCAP, L, P,
        schedule, small)

    ov_piv = ov_cand | ov_lane | ov_res
    rid_l = ridp[piv_idx]
    valid = ok & ~ov_piv[piv_idx] & ~ov_read[jnp.clip(rid_l, 0, None)] \
        & (rid_l >= 0)
    # emission: per pivot, candidates grouped by death column (survivors =
    # group 0); the max-slot lane of each group wins (backend._round2's
    # lexsort emission rule, see ops/smem.py ROUND2 NOTES)
    n_off = cand_n[piv_idx, slot_idx].astype(I32)
    m_abs = xp[piv_idx] - col
    n_abs = xp[piv_idx] + n_off
    ok_len = (n_abs - m_abs + 1) >= msl
    grp = piv_idx * (L + 2) + jnp.where(died, col + 1, 0)
    gkey = jnp.where(valid, grp.astype(I64) * 256 + slot_idx, BIG64)
    perm = jnp.argsort(gkey).astype(I32)
    g = grp[perm]
    v = valid[perm]
    last = jnp.concatenate([g[:-1] != g[1:],
                            jnp.ones((1,), bool)]) & v
    return (_Emits(rid=rid_l[perm], m=m_abs[perm], n=n_abs[perm],
                   k=k[perm], s=s[perm], emit=last & ok_len[perm]),
            ov_piv)


# survivor-compaction schedules: (steps, cap_divisor) per phase.  Tier-1
# walks are front-loaded (p50 death = 0 steps, 3.4% alive after 16); tier-2
# pivots live in repeat regions where the interval shrinks slowly (65%
# alive after 32) — compacting early there loses lanes to phase caps, so
# tier 2 locksteps long before its first compaction.
SCHED_T1 = ((4, 2), (4, 3), (8, 8), (16, 24), (32, 48))
SCHED_T2 = ((48, 2), (24, 4), (24, 16))


def _bwd_phased(dfm, enc, ridp, xp, mip, ck, cs, piv_idx, slot_idx, ok,
                MCAP: int, L: int, P: int, schedule=SCHED_T1,
                small: bool = False):
    """Backward candidate walks with survivor compaction between phases.

    The walk-length distribution is extremely front-loaded (p50=0 steps,
    32%% alive after 8, 3.4%% after 16 on the chr21 bench): lockstepping
    all MCAP lanes for 32 steps then once-compacted resuming (the r4
    two-phase scheme) pays ~2.8x the gather rows of this schedule, and
    gathers are the machine's scarce resource (~76M descriptors/s).
    Survivors that outrun a phase cap mark their pivot for the tier-2
    retry / host oracle (exactness preserved).

    Returns (col, k, s, died) in the original MCAP lane space plus
    ov_res bool[P]."""
    k = ck[piv_idx, slot_idx]
    s = cs[piv_idx, slot_idx]
    x = xp[piv_idx]
    rid = ridp[piv_idx]
    mi = mip[piv_idx]
    alive = ok & (x > 0) & (s > 0)
    col, k, s, died, lost = _bwd_lanes(dfm, enc, rid, x, mi, k, s, alive,
                                       ok, MCAP, L, schedule, small)
    ov_res = jnp.zeros((P,), I32).at[piv_idx].max(
        lost.astype(I32), mode="drop").astype(bool)
    return col, k, s, died, ov_res


def _bwd_lanes(dfm, enc, rid, x, mi, k, s, alive, ok, MCAP: int, L: int,
               schedule=None, small: bool = False):
    """Per-lane phased backward walk (see _bwd_phased).  Returns
    (col, k, s, died, lost bool) all in the MCAP lane space — `lost` marks
    lanes dropped by a survivor phase cap (caller retries their owner)."""
    if small:
        k = k.astype(I32)
        s = s.astype(I32)
        mi = mi.astype(I32)
    col = jnp.zeros((MCAP,), I32)
    died = jnp.zeros((MCAP,), bool)
    out_col = col
    out_k = k
    out_s = s
    out_died = died
    src = jnp.arange(MCAP, dtype=I32)
    out_lost = jnp.zeros((MCAP,), I32)
    phases = tuple((steps, max(MCAP // div, 64))
                   for steps, div in (schedule or SCHED_T1))
    done_steps = 0
    for steps, cap in phases:
        alive, col, k, s, died = _bwd_walk(dfm, enc, rid, x, mi, alive,
                                           col, k, s, died, steps, small)
        done_steps += steps
        out_col = out_col.at[src].set(col, mode="drop")
        out_k = out_k.at[src].set(k, mode="drop")
        out_s = out_s.at[src].set(s, mode="drop")
        out_died = out_died.at[src].set(died, mode="drop")
        if done_steps >= L:
            alive = jnp.zeros_like(alive)
            break
        lost = alive & (jnp.cumsum(alive) > cap)
        out_lost = out_lost.at[src].max(lost.astype(I32), mode="drop")
        sel, okc, _ = _count_compact(alive & ~lost, cap)
        src = jnp.where(okc, src[sel], MCAP)
        rid = rid[sel]
        x = x[sel]
        mi = mi[sel]
        col = col[sel]
        k = k[sel]
        s = s[sel]
        died = died[sel]
        alive = okc
    if done_steps < L:
        alive, col, k, s, died = _bwd_walk(dfm, enc, rid, x, mi, alive,
                                           col, k, s, died,
                                           L - done_steps, small)
        out_col = out_col.at[src].set(col, mode="drop")
        out_k = out_k.at[src].set(k, mode="drop")
        out_s = out_s.at[src].set(s, mode="drop")
        out_died = out_died.at[src].set(died, mode="drop")
    return (out_col, out_k.astype(I64), out_s.astype(I64), out_died,
            out_lost.astype(bool))


@partial(jax.jit, static_argnums=(4,))
def _stage_retry(ov_piv, ridp, xp, mip, PT2: int):
    """Compact tier-1-overflowed pivots for the tier-2 rerun.  Returns the
    retry pivot set + the flags of pivots that didn't even fit tier 2
    (host-oracle residue, in the ORIGINAL pivot space)."""
    f = ov_piv & (ridp >= 0)
    sel, ok, _ = _count_compact(f, PT2)
    lost = f & (jnp.cumsum(f) > PT2)
    return (jnp.where(ok, ridp[sel], -1), jnp.where(ok, xp[sel], 0),
            jnp.where(ok, mip[sel], 1), lost)


@jax.jit
def _concat_emits(e1: _Emits, e2: _Emits) -> _Emits:
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b]), e1, e2)


@partial(jax.jit, static_argnums=(3,))
def _stage_select2(e1: _Emits, split_len, split_width, P2CAP: int):
    """Round-2 re-seeding pivot selection from the round-1 SMEM set
    (mem_collect_smem's split rule, bwamem.cpp:694-714).

    Returns (ridp2/xp2 int32[P2CAP], mip2 int64[P2CAP], plus the selected
    pivots that didn't fit: lost2 flags + (x2, mi2) in e1 lane space)."""
    selp = e1.emit & ((e1.n + 1 - e1.m) >= split_len) \
        & (e1.s <= split_width)
    x2 = (e1.n + 1 + e1.m) >> 1
    mi2 = e1.s + 1
    sel, ok, _ = _count_compact(selp, P2CAP)
    lost2 = selp & (jnp.cumsum(selp) > P2CAP)
    ridp2 = jnp.where(ok, e1.rid[sel], -1)
    xp2 = jnp.where(ok, x2[sel], 0)
    mip2 = jnp.where(ok, mi2[sel], 1)
    return ridp2, xp2, mip2, lost2, x2, mi2


SCHED_SA = ((8, 2), (8, 8), (16, 32))


def _sa_walk(dfm: DeviceFMIndex, pos, schedule=SCHED_SA):
    """Resolve BWT positions to reference coordinates (sa_lookup_kernel
    semantics) with lane compaction between walk phases: the walk length is
    ~Geometric(1/8), so after 8 lockstep steps ~66%% of lanes are done —
    compacting the survivors between phases cuts the gather volume ~3x at
    OCAP-scale lane counts.  All lanes resolve exactly (the tail runs a
    while-loop on the residue)."""
    M = pos.shape[0]

    def step_fn(st):
        done, sp, offset, hit_sent = st
        b, occ = bwt_char_occ(dfm, sp)
        sent = ~done & (b == 4)
        hit_sent = hit_sent | sent
        bc = jnp.where(b == 4, 0, b).astype(I32)
        sp2 = take_counts(dfm.counts, bc) + occ
        step = ~done & ~sent
        sp = jnp.where(step, sp2, sp)
        offset = jnp.where(step, offset + 1, offset)
        done = done | sent | (step & ((sp & 7) == 0))
        return done, sp, offset, hit_sent

    def run_phase(st, nsteps):
        for _ in range(nsteps):
            st = step_fn(st)
        return st

    offset = jnp.zeros_like(pos)
    done = (pos & 7) == 0
    st = (done, pos, offset, jnp.zeros(pos.shape, bool))
    out_sp = pos
    out_off = offset
    out_sent = jnp.zeros(pos.shape, bool)
    src = jnp.arange(M, dtype=I32)   # original lane of each live slot
    for steps, div in schedule:
        st = run_phase(st, steps)
        done, sp, offset, hit_sent = st
        out_sp = out_sp.at[src].set(sp, mode="drop")
        out_off = out_off.at[src].set(offset, mode="drop")
        out_sent = out_sent.at[src].set(hit_sent, mode="drop")
        cap = max(M // div, 8)
        sel, ok, _ = _count_compact(~done, cap)
        src = jnp.where(ok, src[sel], M)
        st = (~ok, sp[sel], offset[sel], hit_sent[sel])
    # tail: the rare deep walks, full while_loop on the small lane set
    st = jax.lax.while_loop(lambda st: jnp.any(~st[0]),
                            lambda st: run_phase(st, 8), st)
    done, sp, offset, hit_sent = st
    out_sp = out_sp.at[src].set(sp, mode="drop")
    out_off = out_off.at[src].set(offset, mode="drop")
    out_sent = out_sent.at[src].set(hit_sent, mode="drop")
    idx = (out_sp >> 3).astype(I32)
    sa = (_fetch_rows(dfm, dfm.sa_ms, idx).astype(I64) << 32) \
        + _fetch_rows(dfm, dfm.sa_ls, idx).astype(I64)
    return jnp.where(out_sent, out_off, sa + out_off)


@partial(jax.jit, static_argnums=(9, 10, 11, 12, 13))
def _stage_merge_sa(dfm: DeviceFMIndex, e1: _Emits, e2: _Emits, r3,
                    ov_read, ov_f, ov_rid, ov_x, ov_mi,
                    L: int, SCAP: int, OCAP: int, OVCAP: int,
                    narrow: bool, max_occ=None):
    """Merge the rounds' emissions, sort by (rid, m, n), expand the
    max_occ-sampled SA positions, resolve them, and compact the overflow
    pivot list.  `narrow`: coordinates/sizes fit uint32 (2*l_pac < 2^32)."""
    (n3out, x3, n3, s3, k3) = r3
    N = n3out.shape[0]
    cap3 = x3.shape[1]
    rid3 = jnp.broadcast_to(jnp.arange(N, dtype=I32)[:, None],
                            (N, cap3)).reshape(-1)
    slot3 = jnp.broadcast_to(jnp.arange(cap3, dtype=I32)[None, :],
                             (N, cap3)).reshape(-1)
    v3 = (slot3 < n3out[rid3]) & ~ov_read[rid3]

    rid = jnp.concatenate([e1.rid, e2.rid, rid3])
    m = jnp.concatenate([e1.m, e2.m, x3.reshape(-1).astype(I32)])
    n = jnp.concatenate([e1.n, e2.n, n3.reshape(-1).astype(I32)])
    k = jnp.concatenate([e1.k, e2.k, k3.reshape(-1)])
    s = jnp.concatenate([e1.s, e2.s, s3.reshape(-1).astype(I64)])
    valid = jnp.concatenate([e1.emit, e2.emit, v3])
    T = rid.shape[0]
    lane = jnp.arange(T, dtype=I64)
    key = ((((rid.astype(I64) << 10) | (m + 1).astype(I64)) << 10
            | (n + 1).astype(I64)) << 22) | lane
    key = jnp.where(valid, key, BIG64)
    perm = jnp.argsort(key)[:SCAP].astype(I32)
    nsm = jnp.sum(valid, dtype=I32)
    ok_s = jnp.arange(SCAP, dtype=I32) < nsm
    rid_s = jnp.where(ok_s, rid[perm], N)
    m_s = jnp.where(ok_s, m[perm], 0)
    n_s = jnp.where(ok_s, n[perm], 0)
    k_s = jnp.where(ok_s, k[perm], 0)
    s_s = jnp.where(ok_s, s[perm], 0)

    # max_occ-sampled SA positions (sa_positions_batch semantics)
    cnt = jnp.minimum(s_s, max_occ).astype(I32)
    occ_off = jnp.concatenate([jnp.zeros((1,), I32), jnp.cumsum(cnt)])
    npos = occ_off[-1]
    # position -> owning smem slot without a binary search (which costs
    # log2(SCAP) gathers per lane): scatter-max each non-empty slot's
    # index at its start offset, then a prefix max
    p = jnp.arange(OCAP, dtype=I32)
    starts = occ_off[:SCAP]
    mark = jnp.full((OCAP,), -1, I32).at[
        jnp.where(cnt > 0, jnp.clip(starts, 0, OCAP - 1), OCAP)].max(
        jnp.arange(SCAP, dtype=I32), mode="drop")
    slot = jnp.clip(jax.lax.cummax(mark), 0, SCAP - 1)
    j = p - occ_off[slot]
    s_sl = s_s[slot]
    step = jnp.where(s_sl > max_occ, s_sl // max_occ, 1)
    pos = k_s[slot] + j.astype(I64) * step
    pos = jnp.where(p < npos, pos, 0)
    coords = _sa_walk(dfm, pos)

    # host-oracle pivot list (tier-2 residue)
    selo, oko, n_ovp = _count_compact(ov_f, OVCAP)
    ovp_rid = jnp.where(oko, ov_rid[selo], -1)
    ovp_x = jnp.where(oko, ov_x[selo], 0)
    ovp_mi = jnp.where(oko, ov_mi[selo], 1)
    # pivots beyond OVCAP: their reads fall back wholesale
    lost_ov = ov_f & (jnp.cumsum(ov_f) > OVCAP)
    ov_read2 = jnp.zeros((N,), I32).at[jnp.clip(ov_rid, 0, None)].max(
        lost_ov.astype(I32), mode="drop").astype(bool)

    if narrow:
        rid_s = rid_s.astype(jnp.int16)
        m_s = m_s.astype(jnp.int16)
        n_s = n_s.astype(jnp.int16)
        s_s = s_s.astype(jnp.uint32)
        k_s = k_s.astype(jnp.uint32)
        coords = coords.astype(jnp.uint32)
    return (rid_s, m_s, n_s, s_s, k_s, nsm, coords, npos,
            ovp_rid, ovp_x, ovp_mi, n_ovp, ov_read2)


class FusedSeeder:
    """Per-chunk fused seeding driver: chains the jitted stages with
    device-resident intermediates and ONE final fetch; patches capacity
    overflows with the exact native oracle on the host."""

    def __init__(self, fm, dfm: DeviceFMIndex):
        self.fm = fm
        self.dfm = dfm
        self.narrow = 2 * fm.l_pac < 2**32
        # int32 interval arithmetic is exact when the doubled genome fits
        self.small = fm.l_pac < DeviceFMIndex.SMALL_MAX_PAC

    @staticmethod
    def caps(N: int, L: int, big: bool = False):
        """`big`: gigabase-class genome — candidate counts per pivot grow
        with log(genome) and the repeat tail thickens, so round 2's tier-1
        candidate cap widens (round 1 has no per-pivot cap)."""
        from .backend import pivot_cap
        return dict(P1=pivot_cap(L), C1=48 if big else 32, C2=224 if big
                    else 192,
                    MCAP=40 * N, PT2=max(N // 4, 512), MT2=8 * N,
                    P2CAP=2 * N, MCAP2=24 * N, SCAP=12 * N, OCAP=28 * N,
                    OVCAP=8192)

    def _round_tiered(self, encj, ridp, xp, mip, ov_read, cp, msl, MCAP):
        """Tier-1 round + on-device tier-2 retry of overflowed pivots.
        Returns (emits concat, residual-oracle (f, rid, x, mi) arrays)."""
        dfm = self.dfm
        e1, ov1 = _stage_round(dfm, encj, ridp, xp, mip, ov_read,
                               cp["C1"], MCAP, SCHED_T1, self.small, msl)
        ridb, xb, mib, lostb = _stage_retry(ov1, ridp, xp, mip, cp["PT2"])
        e2, ov2 = _stage_round(dfm, encj, ridb, xb, mib, ov_read,
                               cp["C2"], cp["MT2"], SCHED_T2, self.small,
                               msl)
        e = _concat_emits(e1, e2)
        f = jnp.concatenate([lostb, ov2 & (ridb >= 0)])
        rid = jnp.concatenate([ridp, ridb])
        x = jnp.concatenate([xp, xb])
        mi = jnp.concatenate([mip, mib])
        return e, (f, rid, x, mi)

    def run(self, encj, lensj, opt):
        """Dispatch the fused pipeline for one padded read grid.  Returns
        the raw fetched tuple + caps (host assembly in backend)."""
        N, L = encj.shape
        assert N <= 32768 and L <= 512
        cp = self.caps(N, L, not self.small)
        dfm = self.dfm
        msl = jnp.int32(opt.min_seed_len)
        # round 1: single-pass chain + candidate collection, phased
        # backward walks; reads that outrun a pool retry their pivots at
        # the tier-2 caps (same compiled stage round 2's tier-2 uses)
        (npiv, px, pushed, pk, ps, pxl, pnl, ov_read) =             _stage_chain_collect(dfm, encj, lensj, cp["P1"], self.narrow)
        e1a, retry_read = _stage_bwd_emit1(dfm, encj, pushed, pk, ps,
                                           pxl, pnl, ov_read, msl,
                                           cp["MCAP"], L, self.small)
        ridr, xr, mir, lostr, lost_rid, lost_x = _stage_retry_reads(
            retry_read & ~ov_read, npiv, px, cp["P1"], cp["PT2"])
        e1b, ov1b = _stage_round(dfm, encj, ridr, xr, mir, ov_read,
                                 cp["C2"], cp["MT2"], SCHED_T2, self.small,
                                 msl)
        e1 = _concat_emits(e1a, e1b)
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        ridp2, xp2, mip2, lost2, x2_l, mi2_l = _stage_select2(
            e1, jnp.int32(split_len), jnp.int64(opt.split_width),
            cp["P2CAP"])
        e2, ov2 = self._round_tiered(encj, ridp2, xp2, mip2, ov_read, cp,
                                     msl, cp["MCAP2"])
        if opt.max_mem_intv > 0:
            msl_p1 = max(opt.min_seed_len + 1, 2)
            cap3 = L // msl_p1 + 1
            r3 = round3_replay_kernel(dfm, encj, lensj,
                                      jnp.int64(opt.max_mem_intv),
                                      jnp.int32(msl_p1), cap3)
        else:
            z16 = jnp.zeros((N, 1), jnp.int16)
            r3 = (jnp.zeros((N,), I32), z16, z16,
                  jnp.zeros((N, 1), I32), jnp.zeros((N, 1), I64))
        ov_f = jnp.concatenate([ov1b & (ridr >= 0), lostr, ov2[0], lost2])
        ov_rid = jnp.concatenate([ridr, lost_rid, ov2[1], e1.rid])
        ov_x = jnp.concatenate([xr, lost_x, ov2[2], x2_l])
        ov_mi = jnp.concatenate([mir, jnp.ones_like(lost_rid, I64),
                                 ov2[3], mi2_l])
        out = _stage_merge_sa(
            dfm, e1, e2, r3, ov_read, ov_f, ov_rid, ov_x, ov_mi,
            L, cp["SCAP"], cp["OCAP"], cp["OVCAP"], self.narrow,
            jnp.int64(opt.max_occ))
        return jax.device_get(out + (ov_read,)), cp
