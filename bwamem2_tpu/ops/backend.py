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
from .smem import (round1_compact_kernel, round2_backward_kernel,
                   round2_forward_kernel, round3_replay_kernel)

ROUND2_MAX_CAND = 64
ROUND1_CAP = 24   # compact SMEM slots per read; overflow -> host oracle


@jax.jit
def _gather2d_pair(a, b, i, j):
    return a[i, j], b[i, j]


def _pad_reads(encs: list[np.ndarray], L: int | None = None):
    # bucket both dims so the jitted kernels compile once per bucket
    N = bucket_pow2(len(encs), 64)
    L = round_up(L or max((len(e) for e in encs), default=1), 32)
    enc = np.full((N, L), 4, dtype=np.int8)
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

        # ---- round 1: device walk + emit + compaction; tiny transfers ----
        t0 = __import__("time").perf_counter()
        cnt, n1, b1, s1, k1 = round1_compact_kernel(
            self.dfm, encj, lensj, self.lut_k_bits,
            jnp.int32(opt.min_seed_len), ROUND1_CAP)
        cnt = np.asarray(cnt)[:NR]
        n1 = np.asarray(n1)[:NR]
        b1 = np.asarray(b1)[:NR]
        s1 = np.asarray(s1)[:NR]
        k1 = np.asarray(k1)[:NR]
        overflow_reads = np.nonzero(cnt > ROUND1_CAP)[0]
        oflow = set(overflow_reads.tolist())
        for rid in range(NR):
            if rid in oflow:
                continue
            c = int(cnt[rid])
            nr, br, kr, sr = n1[rid], b1[rid], k1[rid], s1[rid]
            per_read[rid] = [(rid, int(br[j]), int(nr[j]), int(kr[j]), 0,
                              int(sr[j])) for j in range(c)]
        PROF.add("seeding.round1", __import__("time").perf_counter() - t0)

        # ---- round 2: re-seed long low-occurrence SMEMs ----
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        pivots = []  # (rid, x, min_intv)
        for rid in range(NR):
            if rid in oflow:
                continue
            for (_, m, n, kk, _, ss) in per_read[rid]:
                if (n + 1 - m) >= split_len and ss <= opt.split_width:
                    pivots.append((rid, (n + 1 + m) >> 1, ss + 1))
        if pivots:
            with PROF("seeding.round2"):
                self._round2(enc, lens, pivots, opt, per_read)

        # ---- round 3: per-read pivot-chain replay on device ----
        if opt.max_mem_intv > 0:
            t0 = __import__("time").perf_counter()
            msl_p1 = max(opt.min_seed_len + 1, 2)
            cap3 = L // (msl_p1 + 1) + 1
            n3out, x3, n3, s3, k3 = round3_replay_kernel(
                self.dfm, encj, lensj, jnp.int64(opt.max_mem_intv),
                jnp.int32(msl_p1), cap3)
            n3out = np.asarray(n3out)[:NR]
            x3 = np.asarray(x3)[:NR]
            n3 = np.asarray(n3)[:NR]
            s3 = np.asarray(s3)[:NR]
            k3 = np.asarray(k3)[:NR]
            for rid in range(NR):
                if rid in oflow:
                    continue
                for j in range(int(n3out[rid])):
                    per_read[rid].append((rid, int(x3[rid, j]),
                                          int(n3[rid, j]), int(k3[rid, j]),
                                          0, int(s3[rid, j])))
            PROF.add("seeding.round3", __import__("time").perf_counter() - t0)

        # ---- overflowed reads: exact host-oracle fallback (rare) ----
        if len(overflow_reads):
            from ..align.seeding import collect_smems as host_collect
            sub = host_collect(self.fm, [encs[r] for r in overflow_reads],
                               opt)
            for r, out in zip(overflow_reads.tolist(), sub):
                per_read[r] = [(r,) + t[1:] for t in out]
            # already sorted by host_collect; skip the re-sort below
        for rid in range(NR):
            if rid in oflow:
                continue
            per_read[rid].sort(key=lambda t: (t[1] << 32) | t[2])
        return per_read

    def _round2(self, enc, lens, pivots, opt, per_read):
        P = bucket_pow2(len(pivots), 64)
        L = enc.shape[1]
        enc_p = np.full((P, L), 4, np.int8)
        plen = np.zeros((P,), np.int32)
        min_intv = np.ones((P,), np.int64)
        for i, (rid, x, mi) in enumerate(pivots):
            ln = lens[rid]
            enc_p[i, : ln - x] = enc[rid, x:ln]
            plen[i] = ln - x
            min_intv[i] = mi
        cn, ck_dev, cl, cs_dev, ncand = round2_forward_kernel(
            self.dfm, jnp.asarray(enc_p), jnp.asarray(plen),
            jnp.asarray(min_intv), ROUND2_MAX_CAND)
        # ck/cs stay device-resident (int64 grids): the backward pass
        # gathers its lane inputs from them on device
        cn = np.asarray(cn)
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
        pad = M - len(lane_piv)
        enc_rev = np.full((M, L), 4, np.int8)
        rlen = np.zeros((M,), np.int32)
        bmi = np.ones((M,), np.int64)
        for j, (i, t) in enumerate(zip(lane_piv, lane_slot)):
            rid, x, mi = pivots[i]
            enc_rev[j, :x] = enc[rid, :x][::-1]
            rlen[j] = x
            bmi[j] = mi
        piv_idx = np.concatenate([np.asarray(lane_piv, np.int32),
                                  np.zeros(pad, np.int32)])
        slot_idx = np.concatenate([np.asarray(lane_slot, np.int32),
                                   np.zeros(pad, np.int32)])
        bk, bs = _gather2d_pair(ck_dev, cs_dev, jnp.asarray(piv_idx),
                                jnp.asarray(slot_idx))
        bs = jnp.where(jnp.arange(M) < len(lane_piv), bs, 0)
        steps, fk, fs, died = round2_backward_kernel(
            self.dfm, jnp.asarray(enc_rev), jnp.asarray(rlen),
            bk, bs, jnp.asarray(bmi))
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
