"""Device backend: runs seeding / SA-resolution / extension scoring on TPU,
feeding the same host pipeline as the oracle path with identical results.

collect_smems() reproduces mem_collect_smem's 3-round output exactly (tested
against align/seeding.py); SA lookups and banded-SW extension scoring are
batched device calls.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex
from ..utils.profiling import PROF
from . import bucket_pow2, round_up
from .device_index import DeviceFMIndex
from .salookup import sa_lookup_kernel
from .smem import (round1_emit, round1_kernel, round1_phase_kernel,
                   round1_tail_kernel, round2_backward_kernel,
                   round2_forward_kernel, round3_kernel)

ROUND2_MAX_CAND = 64
ROUND1_PHASE_ITERS = 24   # ~all lanes' intervals empty within this many steps


def _pad_reads(encs: list[np.ndarray], L: int | None = None):
    # bucket both dims so the jitted kernels compile once per bucket
    N = bucket_pow2(len(encs), 64)
    L = round_up(L or max((len(e) for e in encs), default=1), 32)
    enc = np.full((N, L), 4, dtype=np.int32)
    lens = np.zeros((N,), dtype=np.int32)
    for i, e in enumerate(encs):
        enc[i, : len(e)] = e
        lens[i] = len(e)
    return enc, lens


class DeviceBackend:
    def __init__(self, fm: FMIndex, opt, device=None, bucket: int = 512,
                 use_device_bsw: bool = True, use_klut: bool = True,
                 index_prefix: str | None = None):
        self.fm = fm
        self.opt = opt
        self.lut_k_bits = 0
        lut = None
        if use_klut:
            from ..index.klut import load_or_build_klut
            K, lk, ls = load_or_build_klut(fm, index_prefix)
            self.lut_k_bits = K
            lut = (lk, ls)
        self.dfm = DeviceFMIndex.from_host(fm, device=device, lut=lut)
        self.bucket = bucket
        self.use_device_bsw = use_device_bsw
        self._bsw = None
        if use_device_bsw:
            from .bsw import DeviceBSW
            self._bsw = DeviceBSW(self.dfm, opt)

    # ------------------------------------------------------------------
    # SMEM collection (3 rounds)
    # ------------------------------------------------------------------
    def collect_smems(self, encs: list[np.ndarray], opt) -> list[list[tuple]]:
        enc, lens = _pad_reads(encs)
        N, L = enc.shape
        NR = len(encs)
        encj = jnp.asarray(enc)
        lensj = jnp.asarray(lens)

        per_read: list[list[tuple]] = [[] for _ in encs]

        # ---- round 1 (K-mer LUT start + phase + compacted tail) ----
        t0 = __import__("time").perf_counter()
        b, k, s, col, alive = round1_phase_kernel(self.dfm, encj, lensj,
                                                  ROUND1_PHASE_ITERS,
                                                  self.lut_k_bits)
        alive_h = np.asarray(alive)
        b_h = np.array(b)
        k_h = np.array(k)
        s_h = np.array(s)
        ri, ci = np.nonzero(alive_h)
        if len(ri):
            M = bucket_pow2(len(ri), 64)
            pad = M - len(ri)
            enc_rows = enc[np.concatenate([ri, np.zeros(pad, np.int64)])]
            colv = np.concatenate([np.asarray(col)[ri, ci],
                                   np.full(pad, -1, np.int32)])
            kv = np.concatenate([k_h[ri, ci], np.zeros(pad, np.int64)])
            sv = np.concatenate([s_h[ri, ci], np.zeros(pad, np.int64)])
            bv = np.concatenate([b_h[ri, ci], np.zeros(pad, np.int32)])
            bt, kt, st = round1_tail_kernel(
                self.dfm, jnp.asarray(enc_rows), jnp.asarray(colv, jnp.int32),
                jnp.asarray(kv), jnp.asarray(sv), jnp.asarray(bv, jnp.int32))
            bt = np.asarray(bt)[: len(ri)]
            kt = np.asarray(kt)[: len(ri)]
            st = np.asarray(st)[: len(ri)]
            b_h[ri, ci] = bt
            k_h[ri, ci] = kt
            s_h[ri, ci] = st
        emit = round1_emit(b_h, k_h, s_h, lens, opt.min_seed_len)
        PROF.add("seeding.round1", __import__("time").perf_counter() - t0)
        rids, cols = np.nonzero(emit)
        for rid, n in zip(rids.tolist(), cols.tolist()):
            per_read[rid].append((rid, int(b_h[rid, n]), n,
                                  int(k_h[rid, n]), 0, int(s_h[rid, n])))

        # ---- round 2: re-seed long low-occurrence SMEMs ----
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        pivots = []  # (rid, x, min_intv)
        for rid in range(NR):
            for (_, m, n, kk, _, ss) in per_read[rid]:
                if (n + 1 - m) >= split_len and ss <= opt.split_width:
                    pivots.append((rid, (n + 1 + m) >> 1, ss + 1))
        if pivots:
            with PROF("seeding.round2"):
                self._round2(enc, lens, pivots, opt, per_read)

        # ---- round 3 ----
        if opt.max_mem_intv > 0:
            t0 = __import__("time").perf_counter()
            stop, emit3, n3, k3, s3 = round3_kernel(
                self.dfm, encj, lensj, jnp.int64(opt.max_mem_intv),
                jnp.int32(opt.min_seed_len + 1))
            stop = np.asarray(stop)
            emit3 = np.asarray(emit3)
            n3 = np.asarray(n3)
            k3 = np.asarray(k3)
            s3 = np.asarray(s3)
            for rid in range(NR):
                x = 0
                ln = lens[rid]
                while x < ln:
                    if emit3[rid, x]:
                        per_read[rid].append((rid, x, int(n3[rid, x]),
                                              int(k3[rid, x]), 0,
                                              int(s3[rid, x])))
                    x = int(stop[rid, x]) + 1
            PROF.add("seeding.round3", __import__("time").perf_counter() - t0)

        for rid in range(NR):
            per_read[rid].sort(key=lambda t: (t[1] << 32) | t[2])
        return per_read

    def _round2(self, enc, lens, pivots, opt, per_read):
        P = bucket_pow2(len(pivots), 64)
        L = enc.shape[1]
        enc_p = np.full((P, L), 4, np.int32)
        plen = np.zeros((P,), np.int32)
        min_intv = np.ones((P,), np.int64)
        for i, (rid, x, mi) in enumerate(pivots):
            ln = lens[rid]
            enc_p[i, : ln - x] = enc[rid, x:ln]
            plen[i] = ln - x
            min_intv[i] = mi
        cn, ck, cl, cs, ncand = round2_forward_kernel(
            self.dfm, jnp.asarray(enc_p), jnp.asarray(plen),
            jnp.asarray(min_intv), ROUND2_MAX_CAND)
        cn = np.asarray(cn)
        ck = np.asarray(ck)
        cs = np.asarray(cs)
        ncand = np.asarray(ncand)

        # overflowed pivots fall back to the host oracle
        overflow = ncand > ROUND2_MAX_CAND
        if overflow.any():
            from ..align.seeding import smems_one_pos
            for i in np.nonzero(overflow)[0]:
                rid, x, mi = pivots[i]
                out = []
                smems_one_pos(self.fm, enc[rid, : lens[rid]].astype(np.uint8),
                              rid, x, mi, opt.min_seed_len, out)
                per_read[rid].extend(out)

        # flatten candidate lanes for the backward pass
        lane_piv, lane_slot = [], []
        for i in range(len(pivots)):
            if overflow[i]:
                continue
            for t in range(int(ncand[i])):
                lane_piv.append(i)
                lane_slot.append(t)
        if not lane_piv:
            return
        M = bucket_pow2(len(lane_piv), 64)
        enc_rev = np.full((M, L), 4, np.int32)
        rlen = np.zeros((M,), np.int32)
        bk = np.zeros((M,), np.int64)
        bs = np.zeros((M,), np.int64)
        bmi = np.ones((M,), np.int64)
        for j, (i, t) in enumerate(zip(lane_piv, lane_slot)):
            rid, x, mi = pivots[i]
            enc_rev[j, :x] = enc[rid, :x][::-1]
            rlen[j] = x
            bk[j] = ck[i, t]
            bs[j] = cs[i, t]
            bmi[j] = mi
        steps, fk, fs, died = round2_backward_kernel(
            self.dfm, jnp.asarray(enc_rev), jnp.asarray(rlen),
            jnp.asarray(bk), jnp.asarray(bs), jnp.asarray(bmi))
        steps = np.asarray(steps)
        fk = np.asarray(fk)
        fs = np.asarray(fs)
        died = np.asarray(died)

        # emission rules (see module docstring of ops/smem.py)
        lane_of = {}
        for j, (i, t) in enumerate(zip(lane_piv, lane_slot)):
            lane_of[(i, t)] = j
        for i in range(len(pivots)):
            if overflow[i]:
                continue
            rid, x, mi = pivots[i]
            nc = int(ncand[i])
            if nc == 0:
                continue
            # candidates in descending n (pushed ascending)
            order = list(range(nc - 1, -1, -1))
            emitted_steps = set()
            survivor_done = False
            for t in order:
                j = lane_of[(i, t)]
                n_abs = x + int(cn[i, t])
                m_abs = x - int(steps[j])
                if died[j]:
                    st = int(steps[j])
                    if st in emitted_steps:
                        continue
                    emitted_steps.add(st)
                    if n_abs - m_abs + 1 >= opt.min_seed_len:
                        per_read[rid].append((rid, m_abs, n_abs, int(fk[j]),
                                              0, int(fs[j])))
                else:
                    if survivor_done:
                        continue
                    survivor_done = True
                    if n_abs - m_abs + 1 >= opt.min_seed_len:
                        per_read[rid].append((rid, m_abs, n_abs, int(fk[j]),
                                              0, int(fs[j])))

    # ------------------------------------------------------------------
    # batched SA lookup
    # ------------------------------------------------------------------
    def sa_lookup(self, positions: np.ndarray) -> np.ndarray:
        n = len(positions)
        if n == 0:
            return np.zeros(0, np.int64)
        M = bucket_pow2(n, 256)
        # pad with sampled slots (walk length 0) so the while_loop's trip
        # count is set by real lanes only
        pos = np.zeros((M,), np.int64)
        pos[:n] = positions
        with PROF("sa_lookup"):
            out = sa_lookup_kernel(self.dfm, jnp.asarray(pos, jnp.int64))
            res = np.asarray(out)[:n]
        return res

    # ------------------------------------------------------------------
    # banded-SW extension kernels
    # ------------------------------------------------------------------
    @property
    def left_bsw_kernel(self):
        if self._bsw is not None:
            return self._bsw.left_kernel
        from ..align.extend import native_bsw_kernel_factory
        return native_bsw_kernel_factory("pen_clip5")

    @property
    def right_bsw_kernel(self):
        if self._bsw is not None:
            return self._bsw.right_kernel
        from ..align.extend import native_bsw_kernel_factory
        return native_bsw_kernel_factory("pen_clip3")
