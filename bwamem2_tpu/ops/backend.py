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
from .smem import (round1_chain_kernel, round1_compact_kernel,
                   round2_backward_kernel, round2_backward_resume_kernel,
                   round2_forward_kernel, round3_replay_kernel)

ROUND2_MAX_CAND = 24  # distinct interval sizes along one forward path:
# observed max 15 on 100kb/4.6Mb genomes, ~log(genome); overflow pivots
# fall back to the exact host oracle
ROUND1_CAP = 24   # compact SMEM slots per read; overflow -> host oracle
ROUND1_PIVOT_CAP = 48  # pivot-chain slots per read; overflow -> host oracle


def pivot_cap(L: int) -> int:
    """Round-1 pivot-chain slots per read, scaled to the (padded) read
    length so pacbio/ont2d chunks stay on the device path: at ~10%% error
    the pivot chain has one entry per SMEM (~L/18 observed), so L//8 slots
    never overflow in practice; genuine overflows still fall back to the
    exact host oracle.  Tied to the L bucket -> no extra compile variants."""
    return ROUND1_PIVOT_CAP if L <= 512 else min(round_up(L // 8, 64), 4096)


def _pad_reads(encs: list[np.ndarray], L: int | None = None):
    # bucket both dims so the jitted kernels compile once per bucket; L is
    # kept tight (multiple of 8) — seeding cost scales with iters * lanes
    # = O(L^2), so 101bp reads at L=104 beat L=128 by ~1.5x
    N = bucket_pow2(len(encs), 64)
    L = round_up(L or max((len(e) for e in encs), default=1), 8)
    enc = np.full((N, L), 4, dtype=np.int8)
    lens = np.zeros((N,), dtype=np.int32)
    for i, e in enumerate(encs):
        enc[i, : len(e)] = e
        lens[i] = len(e)
    return enc, lens


class DeviceBackend:
    def __init__(self, fm: FMIndex, opt, device=None, bucket: int = 512,
                 use_device_bsw: bool = True, use_klut: bool = True,
                 index_prefix: str | None = None,
                 pivot_seeding: bool = True,
                 mesh=None, shard_axis: str = "data"):
        """mesh: a jax.sharding.Mesh enables genome-bucket INDEX sharding
        (SURVEY §5.8): occp/occ_hi/sa tables are split by contiguous row
        range over `shard_axis`, every seeding / SA kernel runs inside
        shard_map with its lane dim sharded over the same axis, and each
        row fetch is the distributed gather of ops.device_index._dist_rows.
        Output is bit-identical to the replicated path (tested); the cost
        is one ICI collective round per LF step, paid for index capacity
        beyond one chip's HBM."""
        self.fm = fm
        self.opt = opt
        # round-1 strategy: reference-shaped pivot chain (default) vs the
        # O(L^2) per-end grid walk (round1_compact_kernel)
        self.pivot_seeding = pivot_seeding
        self.lut_k_bits = 0
        lut = None
        # the K-mer LUT only jump-starts the legacy per-end grid walk; the
        # pivot chain never reads it (268MB + a build pass at human scale)
        if use_klut and not pivot_seeding:
            from ..index.klut import load_or_build_klut
            K, lk, ls = load_or_build_klut(fm, index_prefix)
            self.lut_k_bits = K
            lut = (lk, ls)
        self._device = device
        self.mesh = mesh
        self.shard_axis = shard_axis
        self._sm_cache: dict = {}
        if mesh is not None:
            assert pivot_seeding, "sharded-index mode uses pivot seeding"
            assert device is None, "mesh and device are exclusive"
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.shard_index import index_specs, shard_index
            staged = DeviceFMIndex.from_host(fm, device="host", lut=lut)
            self.dfm = shard_index(mesh, staged, shard_axis)
            self._spec = index_specs(self.dfm, shard_axis)
            self._ndev = int(mesh.shape[shard_axis])
            self._rep_sh = NamedSharding(mesh, PartitionSpec())
        else:
            self.dfm = DeviceFMIndex.from_host(fm, device=device, lut=lut)
        # int32 interval arithmetic is exact when the doubled genome fits
        self.small_index = fm.l_pac < DeviceFMIndex.SMALL_MAX_PAC
        self.bucket = bucket
        self.use_device_bsw = use_device_bsw
        self._bsw = None
        self._kswv = None
        if use_device_bsw:
            from .bsw import DeviceBSW
            self._bsw = DeviceBSW(self.dfm, opt)

    # ------------------------------------------------------------------
    # sharded-index kernel dispatch (mesh mode)
    # ------------------------------------------------------------------
    def _shmap(self, key, fn, in_specs, out_specs):
        """jit(shard_map(fn)) cached per kernel+static config.  Lane args
        are sharded over the mesh axis, the index per its layout specs,
        scalars/grids replicated (GSPMD inserts any reshard)."""
        hit = self._sm_cache.get(key)
        if hit is None:
            hit = jax.jit(jax.shard_map(
                fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False))
            self._sm_cache[key] = hit
        return hit

    def _lane_pad(self, n: int) -> int:
        """Sharded lane dims must split evenly over the mesh axis."""
        return n if self.mesh is None else round_up(n, self._ndev)

    def _k_round1_chain(self, encj, lensj, cap: int):
        if self.mesh is None:
            return round1_chain_kernel(self.dfm, encj, lensj, cap)
        from jax.sharding import PartitionSpec as P
        ax = self.shard_axis
        fn = self._shmap(
            ("r1c", cap),
            lambda dfm, e, l: round1_chain_kernel(dfm, e, l, cap),
            (self._spec, P(ax), P(ax)), (P(ax), P(ax)))
        return fn(self.dfm, encj, lensj)

    def _k_round3(self, encj, lensj, max_intv, msl_p1, cap3: int):
        if self.mesh is None:
            return round3_replay_kernel(self.dfm, encj, lensj, max_intv,
                                        msl_p1, cap3)
        from jax.sharding import PartitionSpec as P
        ax = self.shard_axis
        fn = self._shmap(
            ("r3", cap3),
            lambda dfm, e, l, mx, ms: round3_replay_kernel(
                dfm, e, l, mx, ms, cap3),
            (self._spec, P(ax), P(ax), P(), P()), (P(ax),) * 5)
        return fn(self.dfm, encj, lensj, max_intv, msl_p1)

    def _k_round2_forward(self, encj, ridp_j, xp_j, mi_j, C: int):
        if self.mesh is None:
            return round2_forward_kernel(self.dfm, encj, ridp_j, xp_j,
                                         mi_j, C)
        from jax.sharding import PartitionSpec as P
        ax = self.shard_axis
        fn = self._shmap(
            ("r2f", C),
            lambda dfm, e, r, x, m: round2_forward_kernel(dfm, e, r, x,
                                                          m, C),
            (self._spec, P(), P(ax), P(ax), P(ax)), (P(ax),) * 5)
        return fn(self.dfm, encj, ridp_j, xp_j, mi_j)

    def _k_round2_backward(self, encj, ridp_j, xp_j, ck, cs, piv_idx,
                           slot_idx, mi_j, phase: int):
        """Phase-1 lockstep walk.  In mesh mode the lanes shard over the
        axis while the pivot-level grids (ck/cs/ridp/xp/mi) replicate —
        lanes index pivots globally."""
        if self.mesh is None:
            return round2_backward_kernel(self.dfm, encj, ridp_j, xp_j,
                                          ck, cs, piv_idx, slot_idx,
                                          mi_j, phase)
        from jax.sharding import PartitionSpec as P
        ax = self.shard_axis
        fn = self._shmap(
            ("r2b", phase),
            lambda dfm, e, r, x, k, s, pi, si, m: round2_backward_kernel(
                dfm, e, r, x, k, s, pi, si, m, phase),
            (self._spec, P(), P(), P(), P(), P(), P(ax), P(ax), P()),
            (P(ax),) * 5)
        return fn(self.dfm, encj, ridp_j, xp_j, ck, cs, piv_idx,
                  slot_idx, mi_j)

    def _k_round2_resume(self, encj, rid_s, x_s, mi_s, col_s, k_s,
                         steps: int, s_s):
        if self.mesh is None:
            return round2_backward_resume_kernel(
                self.dfm, encj, rid_s, x_s, mi_s, col_s, k_s, steps, s_s)
        from jax.sharding import PartitionSpec as P
        ax = self.shard_axis
        fn = self._shmap(
            ("r2r", steps),
            lambda dfm, e, r, x, m, c, k, s: round2_backward_resume_kernel(
                dfm, e, r, x, m, c, k, steps, s),
            (self._spec, P(), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
            (P(ax),) * 4)
        return fn(self.dfm, encj, rid_s, x_s, mi_s, col_s, k_s, s_s)

    def _k_sa_lookup(self, posj):
        if self.mesh is None:
            return sa_lookup_kernel(self.dfm, posj)
        from jax.sharding import PartitionSpec as P
        ax = self.shard_axis
        fn = self._shmap("sal", sa_lookup_kernel,
                         (self._spec, P(ax)), P(ax))
        return fn(self.dfm, posj)

    # ------------------------------------------------------------------
    # fused SMEM collection + SA resolution (ops/seedall): one dispatch
    # chain + ONE fetch per chunk, flat arrays straight to the chainer
    # ------------------------------------------------------------------
    _seeder = None
    FUSED_MAX_LEN = 512   # longer reads use the legacy per-stage path

    def collect_chunk(self, encs: list[np.ndarray], opt):
        """Fused seeding: returns (smem_off, m, n, s, occ_off, coords)
        ready for the native chainer — the one-fetch replacement for
        collect_smems + chain.sa_positions_batch + sa_lookup.  Returns
        None when the fused path doesn't apply (mesh mode, long reads,
        oversized chunks); the caller then uses the legacy path."""
        if self.mesh is not None or not self.pivot_seeding:
            return None
        Lmax = max((len(e) for e in encs), default=0)
        if Lmax == 0 or Lmax > self.FUSED_MAX_LEN:
            return None
        enc, lens = _pad_reads(encs)
        N, L = enc.shape
        if N > 16384:
            return None
        NR = len(encs)
        if self._device is not None:
            encj = jax.device_put(enc, self._device)
            lensj = jax.device_put(lens, self._device)
        else:
            encj = jnp.asarray(enc)
            lensj = jnp.asarray(lens)
        if self._bsw is not None:
            assert N * L < 2**31
            self._bsw.encj = encj
        if self._seeder is None:
            from .seedall import FusedSeeder
            self._seeder = FusedSeeder(self.fm, self.dfm)
        with PROF("seeding.fused"):
            out, cp = self._seeder.run(encj, lensj, opt)
        with PROF("seeding.assemble"):
            return self._assemble_chunk(out, cp, encs, NR, opt)

    def _assemble_chunk(self, out, cp, encs, NR: int, opt):
        (rid_s, m_s, n_s, s_s, k_s, nsm, coords, npos,
         ovp_rid, ovp_x, ovp_mi, n_ovp, ov_read2, ov_read) = out
        nsm = int(nsm)
        npos = int(npos)
        n_ovp = min(int(n_ovp), cp["OVCAP"])
        used = min(nsm, cp["SCAP"])
        rid_u = np.asarray(rid_s[:used], np.int64)
        m_u = np.asarray(m_s[:used], np.int32)
        n_u = np.asarray(n_s[:used], np.int32)
        s_u = np.asarray(s_s[:used], np.int64)
        cnt = np.minimum(s_u, opt.max_occ)

        # whole-read fallbacks: device-side capacity overflows + truncated
        # SCAP/OCAP suffixes (arrays are rid-sorted, so cuts are suffixes)
        bad = np.zeros(NR, bool)
        bad |= np.asarray(ov_read[:NR])
        bad |= np.asarray(ov_read2[:NR])
        trunc_rid = None
        if nsm > cp["SCAP"]:
            trunc_rid = int(rid_u[-1])
        if npos > cp["OCAP"]:
            cum = np.cumsum(cnt)
            cut = int(np.searchsorted(cum, cp["OCAP"], "right"))
            trunc_rid_o = int(rid_u[min(cut, used - 1)])
            trunc_rid = trunc_rid_o if trunc_rid is None \
                else min(trunc_rid, trunc_rid_o)
        if trunc_rid is not None:
            bad[trunc_rid:] = True
        PROF.count("overflow.fused_read", int(bad.sum()), NR)
        PROF.count("overflow.fused_pivot", n_ovp)

        if not bad.any() and n_ovp == 0:
            smem_off = np.searchsorted(rid_u, np.arange(NR + 1))
            occ_off = np.zeros(used + 1, np.int64)
            np.cumsum(cnt, out=occ_off[1:])
            coords_u = np.asarray(coords[:npos], np.int64)
            return (smem_off.astype(np.int64), m_u, n_u, s_u, occ_off,
                    coords_u)
        return self._patch_chunk(encs, NR, opt, bad, rid_u, m_u, n_u,
                                 s_u, np.asarray(k_s[:used], np.int64),
                                 cnt, coords, npos,
                                 np.asarray(ovp_rid[:n_ovp], np.int64),
                                 np.asarray(ovp_x[:n_ovp], np.int64),
                                 np.asarray(ovp_mi[:n_ovp], np.int64))

    def _patch_chunk(self, encs, NR, opt, bad, rid_u, m_u, n_u, s_u, k_u,
                     cnt, coords, npos, ovp_rid, ovp_x, ovp_mi):
        """Merge the exact native oracle's output for overflowed pivots /
        reads into the device arrays (the fused path's analog of the r4
        per-pivot oracle fallback)."""
        from ..native import hostrt
        from ..align.chain import sa_positions_batch
        keep = (ovp_rid >= 0) & (ovp_rid < NR)
        keep &= ~bad[np.clip(ovp_rid, 0, NR - 1)]
        ovp_rid, ovp_x, ovp_mi = (a[keep] for a in (ovp_rid, ovp_x,
                                                    ovp_mi))
        extra: dict[int, list] = {}
        # round-1 pivots (min_intv == 1): oracle, then derive + oracle the
        # round-2 re-seed pivots from their emissions (split rule)
        is1 = ovp_mi == 1
        if is1.any():
            out1 = hostrt.smems_pivots(self.fm, encs, ovp_rid[is1],
                                       ovp_x[is1], ovp_mi[is1],
                                       opt.min_seed_len)
            split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
            r2r, r2x, r2m = [], [], []
            for t in out1:
                extra.setdefault(t[0], []).append(t)
                if (t[2] + 1 - t[1]) >= split_len \
                        and t[5] <= opt.split_width:
                    r2r.append(t[0])
                    r2x.append((t[2] + 1 + t[1]) >> 1)
                    r2m.append(t[5] + 1)
            if r2r:
                for t in hostrt.smems_pivots(
                        self.fm, encs, np.array(r2r, np.int32),
                        np.array(r2x, np.int32), np.array(r2m, np.int64),
                        opt.min_seed_len):
                    extra.setdefault(t[0], []).append(t)
        if (~is1).any():
            for t in hostrt.smems_pivots(self.fm, encs, ovp_rid[~is1],
                                         ovp_x[~is1], ovp_mi[~is1],
                                         opt.min_seed_len):
                extra.setdefault(t[0], []).append(t)

        badidx = np.nonzero(bad)[0]
        whole = {}
        if len(badidx):
            sub = hostrt.collect_smems_reads(
                self.fm, [encs[r] for r in badidx], opt)
            for r, lst in zip(badidx.tolist(), sub):
                whole[r] = [(r,) + t[1:] for t in lst]
        patched = sorted(set(extra) | set(whole))

        smem_off0 = np.searchsorted(rid_u, np.arange(NR + 1))
        occ_off0 = np.zeros(len(rid_u) + 1, np.int64)
        np.cumsum(cnt, out=occ_off0[1:])
        coords_np = np.asarray(coords[:npos], np.int64)

        # merged per-read tuple lists for patched reads; their SA
        # positions re-expand + resolve in ONE extra device call
        merged = {}
        for r in patched:
            if r in whole:
                merged[r] = whole[r]
                continue
            a, b = int(smem_off0[r]), int(smem_off0[r + 1])
            dev = [(r, int(m_u[i]), int(n_u[i]), int(k_u[i]), 0,
                    int(s_u[i])) for i in range(a, b)]
            dev += extra[r]
            dev.sort(key=lambda t: (t[1] << 32) | t[2])
            merged[r] = dev
        # host-native SA walks: a device dispatch here would contend with
        # the already-saturated chip for a handful of positions
        (allpos_p, off_p, m_p, n_p, s_p, occ_p) = sa_positions_batch(
            opt, [merged[r] for r in patched])
        from ..native.hostrt import sa_entries_host
        coords_p = sa_entries_host(self.fm, allpos_p)

        # splice: device segments for clean reads, oracle-merged segments
        # for patched reads
        Ms, Ns, Ss, Cs = [], [], [], []
        smem_off = np.zeros(NR + 1, np.int64)
        occ_off_parts = []
        pmap = {r: i for i, r in enumerate(patched)}
        tot_s = 0
        for r in range(NR):
            if r in pmap:
                i = pmap[r]
                a, b = int(off_p[i]), int(off_p[i + 1])
                Ms.append(m_p[a:b])
                Ns.append(n_p[a:b])
                Ss.append(s_p[a:b])
                Cs.append(coords_p[int(occ_p[a]):int(occ_p[b])])
                tot_s += b - a
            else:
                a, b = int(smem_off0[r]), int(smem_off0[r + 1])
                Ms.append(m_u[a:b])
                Ns.append(n_u[a:b])
                Ss.append(s_u[a:b])
                Cs.append(coords_np[int(occ_off0[a]):int(occ_off0[b])])
                tot_s += b - a
            smem_off[r + 1] = tot_s
        m_f = np.concatenate(Ms) if Ms else np.zeros(0, np.int32)
        n_f = np.concatenate(Ns) if Ns else np.zeros(0, np.int32)
        s_f = np.concatenate(Ss) if Ss else np.zeros(0, np.int64)
        c_f = np.concatenate(Cs) if Cs else np.zeros(0, np.int64)
        cnt_f = np.minimum(s_f, opt.max_occ)
        occ_off = np.zeros(len(s_f) + 1, np.int64)
        np.cumsum(cnt_f, out=occ_off[1:])
        assert occ_off[-1] == len(c_f)
        return (smem_off, m_f.astype(np.int32), n_f.astype(np.int32),
                s_f.astype(np.int64), occ_off, c_f)

    # ------------------------------------------------------------------
    # SMEM collection (3 rounds)
    # ------------------------------------------------------------------
    MAX_DEVICE_READ_LEN = 32000  # device kernels carry int16 coordinates

    def collect_smems(self, encs: list[np.ndarray], opt) -> list[list[tuple]]:
        if max((len(e) for e in encs), default=0) > self.MAX_DEVICE_READ_LEN:
            # ultra-long reads (pacbio/ont presets): the exact host oracle;
            # the per-end device walk is O(L^2) and its compact outputs
            # carry int16 coordinates.  No read grid for this chunk: the
            # extension/rescue descriptor paths must not engage (a stale
            # grid from a previous chunk would silently corrupt output).
            if self._bsw is not None:
                self._bsw.encj = None
            from ..native.hostrt import collect_smems_reads
            return collect_smems_reads(self.fm, encs, opt)
        enc, lens = _pad_reads(encs)
        if self.mesh is not None and enc.shape[0] % self._ndev:
            pad = round_up(enc.shape[0], self._ndev) - enc.shape[0]
            enc = np.concatenate(
                [enc, np.full((pad, enc.shape[1]), 4, enc.dtype)])
            lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
        N, L = enc.shape
        NR = len(encs)
        if self._device is not None:   # multi-chip: pin to this chip
            encj = jax.device_put(enc, self._device)
            lensj = jax.device_put(lens, self._device)
        elif self.mesh is not None:    # replicated read grid over the mesh
            encj = jax.device_put(enc, self._rep_sh)
            lensj = jax.device_put(lens, self._rep_sh)
        else:
            encj = jnp.asarray(enc)
            lensj = jnp.asarray(lens)
        if self._bsw is not None:
            # extension kernels gather query sequences from this chunk's
            # device-resident read grid (descriptor path, ops/bsw.py).
            # The descriptor kernels flatten (seqid, qoff) to seqid*L+qoff
            # in int32 — guard the precondition here, at attach time
            assert N * L < 2**31, \
                f"read grid {N}x{L} overflows int32 flat offsets"
            self._bsw.encj = encj

        per_read: list[list[tuple]] = [[] for _ in encs]

        # ---- round 1 ----
        # round 3 is enqueued right behind it (it only needs enc) so the
        # device computes it while the host chews on rounds 1-2.
        t0 = __import__("time").perf_counter()
        if self.pivot_seeding:
            # reference-shaped pivot chain (see round1_chain_kernel): the
            # per-pivot forward/backward passes reuse the round-2 kernels
            # with min_intv=1
            r1 = self._k_round1_chain(encj, lensj, pivot_cap(L))
        else:
            r1 = round1_compact_kernel(
                self.dfm, encj, lensj, self.lut_k_bits,
                jnp.int32(opt.min_seed_len), ROUND1_CAP, self.small_index)
        r3 = None
        if opt.max_mem_intv > 0:
            msl_p1 = max(opt.min_seed_len + 1, 2)
            # each emit advances the pivot by >= msl_p1 columns
            cap3 = L // msl_p1 + 1
            r3 = self._k_round3(encj, lensj, jnp.int64(opt.max_mem_intv),
                                jnp.int32(msl_p1), cap3)
        if self.pivot_seeding:
            npiv, px = jax.device_get(r1)
            npiv = npiv[:NR]
            px = px[:NR]
            overflow_reads = np.nonzero(npiv > pivot_cap(L))[0]
            oflow = set(overflow_reads.tolist())
            PROF.count("overflow.r1_pivot_cap", len(overflow_reads), NR)
            pivots_r1 = [(rid, int(px[rid, j]), 1)
                         for rid in range(NR) if rid not in oflow
                         for j in range(int(npiv[rid]))]
            PROF.add("seeding.round1",
                     __import__("time").perf_counter() - t0)
            if pivots_r1:
                with PROF("seeding.round1b"):
                    self._round2(encj, lens, pivots_r1, opt, per_read, encs, prof_tag="r1")
        else:
            cnt, n1, b1, s1, k1 = [a[:NR] for a in jax.device_get(r1)]
            overflow_reads = np.nonzero(cnt > ROUND1_CAP)[0]
            oflow = set(overflow_reads.tolist())
            for rid in range(NR):
                if rid in oflow:
                    continue
                c = int(cnt[rid])
                nr, br, kr, sr = n1[rid], b1[rid], k1[rid], s1[rid]
                per_read[rid] = [(rid, int(br[j]), int(nr[j]), int(kr[j]),
                                  0, int(sr[j])) for j in range(c)]
            PROF.add("seeding.round1",
                     __import__("time").perf_counter() - t0)

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
                self._round2(encj, lens, pivots, opt, per_read, encs)

        # ---- round 3: per-read pivot-chain replay (enqueued above) ----
        if r3 is not None:
            t0 = __import__("time").perf_counter()
            n3out, x3, n3, s3, k3 = [a[:NR] for a in jax.device_get(r3)]
            for rid in range(NR):
                if rid in oflow:
                    continue
                for j in range(int(n3out[rid])):
                    per_read[rid].append((rid, int(x3[rid, j]),
                                          int(n3[rid, j]), int(k3[rid, j]),
                                          0, int(s3[rid, j])))
            PROF.add("seeding.round3", __import__("time").perf_counter() - t0)

        # ---- overflowed reads: exact native-oracle fallback (rare) ----
        if len(overflow_reads):
            from ..native.hostrt import collect_smems_reads
            sub = collect_smems_reads(
                self.fm, [encs[r] for r in overflow_reads], opt)
            for r, out in zip(overflow_reads.tolist(), sub):
                per_read[r] = [(r,) + t[1:] for t in out]
            # already sorted by host_collect; skip the re-sort below
        for rid in range(NR):
            if rid in oflow:
                continue
            per_read[rid].sort(key=lambda t: (t[1] << 32) | t[2])
        return per_read

    def _round2(self, encj, lens, pivots, opt, per_read, encs,
                prof_tag=""):
        import time as _time
        _t0 = _time.perf_counter()
        NP = len(pivots)
        P = self._lane_pad(bucket_pow2(NP + 1, 64))  # P-1: dead pad pivot
        L = encj.shape[1]
        rids = np.fromiter((p[0] for p in pivots), np.int32, NP)
        xs = np.fromiter((p[1] for p in pivots), np.int32, NP)
        mis = np.fromiter((p[2] for p in pivots), np.int64, NP)
        # pivot descriptors only — sequences stay on device (pad rid = -1)
        ridp = np.full((P,), -1, np.int32)
        ridp[:NP] = rids
        xp = np.zeros((P,), np.int32)
        xp[:NP] = xs
        min_intv = np.ones((P,), np.int64)
        min_intv[:NP] = mis
        ridp_j = jnp.asarray(ridp)
        xp_j = jnp.asarray(xp)
        mi_j = jnp.asarray(min_intv)
        cn, ck_dev, cl, cs_dev, ncand = self._k_round2_forward(
            encj, ridp_j, xp_j, mi_j, ROUND2_MAX_CAND)
        # ck/cs stay device-resident (int64 grids): the backward pass
        # gathers its lane inputs from them on device
        cn, ncand = jax.device_get((cn, ncand))
        PROF.add(f"seeding.r2{prof_tag}.fwd", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()

        # overflowed pivots fall back to the exact native oracle
        # (rt_smems_pivots, one batched call for the whole chunk)
        overflow = ncand > ROUND2_MAX_CAND
        PROF.count(f"overflow.cand{prof_tag}", int(overflow[:NP].sum()),
                   NP)
        if overflow[:NP].any():
            from ..native import hostrt
            which = np.nonzero(overflow[:NP])[0]
            out = hostrt.smems_pivots(
                self.fm, encs, rids[which], xs[which], mis[which],
                opt.min_seed_len)
            for t in out:
                per_read[t[0]].append(t)
        PROF.add(f"seeding.r2{prof_tag}.oracle",
                 _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()

        # flatten candidate lanes for the backward pass (vectorized)
        nc_ok = np.where(overflow[:NP], 0, ncand[:NP])
        lane_piv = np.repeat(np.arange(NP, dtype=np.int32), nc_ok)
        lane_slot = (np.arange(len(lane_piv), dtype=np.int64)
                     - np.repeat(np.cumsum(nc_ok) - nc_ok, nc_ok)
                     ).astype(np.int32)
        nl = len(lane_piv)
        if nl == 0:
            return
        M = self._lane_pad(bucket_pow2(nl, 64))
        pad = M - nl
        # pad lanes point at a pad pivot slot (xp == 0 -> dead)
        piv_idx = np.concatenate([lane_piv,
                                  np.full(pad, P - 1, np.int32)])
        slot_idx = np.concatenate([lane_slot, np.zeros(pad, np.int32)])
        # two-phase backward walk: a short lockstep phase over all lanes,
        # then only the surviving lanes (typically <10%) re-dispatch
        # compacted for the long tail — most of the full-L gather work
        # never runs (see round2_backward_kernel)
        BWD_PHASE = 32
        steps, fk, fs, died, alive = jax.device_get(
            self._k_round2_backward(
                encj, ridp_j, xp_j, ck_dev, cs_dev, jnp.asarray(piv_idx),
                jnp.asarray(slot_idx), mi_j, BWD_PHASE))
        steps = steps[:nl].copy()
        fk = fk[:nl].copy()
        fs = fs[:nl].copy()
        died = died[:nl].copy()
        alive = alive[:nl]
        live_idx = np.nonzero(alive)[0]
        if len(live_idx):
            Msub = self._lane_pad(bucket_pow2(len(live_idx), 64))
            pad = Msub - len(live_idx)
            lane_p = piv_idx[live_idx]
            rid_s = np.concatenate([ridp[lane_p], np.zeros(pad, np.int32)])
            x_s = np.concatenate([xp[lane_p], np.zeros(pad, np.int32)])
            mi_s = np.concatenate([min_intv[lane_p],
                                   np.ones(pad, np.int64)])
            col_s = np.concatenate([steps[live_idx],
                                    np.zeros(pad, steps.dtype)])
            k_s = np.concatenate([fk[live_idx], np.zeros(pad, np.int64)])
            s_s = np.concatenate([fs[live_idx], np.ones(pad, np.int64)])
            # survivors already took BWD_PHASE steps, so at most
            # L - BWD_PHASE more can execute
            st2 = jax.device_get(self._k_round2_resume(
                encj, jnp.asarray(rid_s), jnp.asarray(x_s),
                jnp.asarray(mi_s), jnp.asarray(col_s), jnp.asarray(k_s),
                int(encj.shape[1]) - BWD_PHASE, jnp.asarray(s_s)))
            steps[live_idx] = st2[0][:len(live_idx)]
            fk[live_idx] = st2[1][:len(live_idx)]
            fs[live_idx] = st2[2][:len(live_idx)]
            died[live_idx] = st2[3][:len(live_idx)]
        PROF.add(f"seeding.r2{prof_tag}.bwd", _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()

        # emission rules (see module docstring of ops/smem.py), vectorized:
        # per pivot, candidates are examined in DESCENDING slot order; each
        # died lane claims its death column (steps) — first claimant wins —
        # and the first surviving lane is the lone survivor emit.  "First in
        # descending slot order" == "max slot per group":
        n_abs = xs[lane_piv] + cn[lane_piv, lane_slot]
        m_abs = xs[lane_piv] - steps
        ok_len = (n_abs - m_abs + 1) >= opt.min_seed_len
        grp = lane_piv.astype(np.int64) * (L + 2) \
            + np.where(died, steps + 1, 0)   # survivors share group 0/pivot
        order = np.lexsort((lane_slot, grp))
        g = grp[order]
        last_in_grp = np.ones(nl, bool)
        last_in_grp[:-1] = g[:-1] != g[1:]
        win = np.zeros(nl, bool)
        win[order] = last_in_grp
        emit = win & ok_len
        for j in np.nonzero(emit)[0].tolist():
            i = int(lane_piv[j])
            per_read[int(rids[i])].append(
                (int(rids[i]), int(m_abs[j]), int(n_abs[j]), int(fk[j]), 0,
                 int(fs[j])))
        PROF.add(f"seeding.r2{prof_tag}.emit", _time.perf_counter() - _t0)

    # ------------------------------------------------------------------
    # batched mate-rescue SW (kswv analog)
    # ------------------------------------------------------------------
    def read_grid_width(self) -> int:
        encj = self._bsw.encj if self._bsw is not None else None
        return 0 if encj is None else int(encj.shape[1])
    def rescue_batch(self, desc: dict) -> np.ndarray | None:
        """Score a chunk's pre-collected rescue problems on device against
        this chunk's read grid; None when no grid is attached (oracle path
        or no chunk in flight on this thread)."""
        encj = self._bsw.encj if self._bsw is not None else None
        if encj is None:
            return None
        if self._kswv is None:
            from .kswv import DeviceKswv
            self._kswv = DeviceKswv(self.dfm, self.opt)
        return self._kswv.align_batch(encj, desc)

    # ------------------------------------------------------------------
    # batched SA lookup
    # ------------------------------------------------------------------
    def sa_lookup(self, positions: np.ndarray, lo: int = 256) -> np.ndarray:
        n = len(positions)
        if n == 0:
            return np.zeros(0, np.int64)
        M = self._lane_pad(bucket_pow2(n, lo))
        # pad with sampled slots (walk length 0) so the while_loop's trip
        # count is set by real lanes only
        pos = np.zeros((M,), np.int64)
        pos[:n] = positions
        with PROF("sa_lookup"):
            out = self._k_sa_lookup(jnp.asarray(pos, jnp.int64))
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
