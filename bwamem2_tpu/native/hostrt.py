"""ctypes bindings + marshalling for the native host runtime (runtime.cpp).

The runtime consumes whole chunks as flat SoA arrays (AlnReg fields), a
blob-of-strings reads view, and a reference-metadata view, and produces SAM
text — replacing align/finalize.py's per-read Python on the hot path.  The
Python implementations remain the behavioral spec and fallback; tests assert
byte-identity between both paths.
"""

from __future__ import annotations

import ctypes
from ctypes import (POINTER, c_char_p, c_float, c_int8, c_int32, c_int64,
                    c_uint8, c_void_p)

import numpy as np

from ..utils.profiling import PROF

from . import get_lib

_pi64 = POINTER(c_int64)
_pi32 = POINTER(c_int32)
_pf32 = POINTER(c_float)
_pu8 = POINTER(c_uint8)


class MemOptC(ctypes.Structure):
    _fields_ = [
        ("a", c_int32), ("b", c_int32), ("o_del", c_int32),
        ("e_del", c_int32), ("o_ins", c_int32), ("e_ins", c_int32),
        ("pen_unpaired", c_int32), ("pen_clip5", c_int32),
        ("pen_clip3", c_int32), ("w", c_int32), ("zdrop", c_int32),
        ("T", c_int32), ("flag", c_int32), ("min_seed_len", c_int32),
        ("max_matesw", c_int32), ("max_XA_hits", c_int32),
        ("max_XA_hits_alt", c_int32), ("mapQ_coef_fac", c_int32),
        ("max_chain_gap", c_int32), ("max_ins", c_int32),
        ("verbose", c_int32),
        ("mask_level", c_float), ("drop_ratio", c_float),
        ("XA_drop_ratio", c_float), ("mask_level_redun", c_float),
        ("mapQ_coef_len", c_float),
        ("mat", c_int8 * 25),
    ]


class BnsC(ctypes.Structure):
    _fields_ = [
        ("l_pac", c_int64), ("n_anns", c_int32),
        ("ann_off", _pi64), ("ann_len", _pi64), ("ann_alt", _pu8),
        ("name_blob", c_char_p), ("name_off", _pi64),
        ("anno_blob", c_char_p), ("anno_off", _pi64),
        ("ref", _pu8),
    ]


class ReadsC(ctypes.Structure):
    _fields_ = [
        ("n", c_int64),
        ("name_blob", c_char_p), ("name_off", _pi64),
        ("seq_blob", c_char_p), ("seq_off", _pi64),
        ("qual_blob", c_char_p), ("qual_off", _pi64),
        ("comment_blob", c_char_p), ("comment_off", _pi64),
    ]


class RegsC(ctypes.Structure):
    _fields_ = [
        ("off", _pi64), ("rb", _pi64), ("re", _pi64),
        ("qb", _pi32), ("qe", _pi32), ("rid", _pi32), ("score", _pi32),
        ("truesc", _pi32), ("sub", _pi32), ("alt_sc", _pi32),
        ("csub", _pi32), ("sub_n", _pi32), ("w", _pi32),
        ("seedcov", _pi32), ("secondary", _pi32), ("secondary_all", _pi32),
        ("seedlen0", _pi32), ("n_comp", _pi32), ("is_alt", _pi32),
        ("frac_rep", _pf32),
    ]


class FmiC(ctypes.Structure):
    _fields_ = [
        ("counts", _pi64), ("cp_count", _pi64),
        ("one_hot", POINTER(ctypes.c_uint64)), ("sentinel", c_int64),
    ]


class SmemsOutC(ctypes.Structure):
    _fields_ = [
        ("n", c_int64),
        ("rid", _pi32), ("m", _pi32), ("nn", _pi32),
        ("k", _pi64), ("l", _pi64), ("s", _pi64),
    ]


class RescueOutC(ctypes.Structure):
    _fields_ = [
        ("n", c_int64),
        ("key_p", _pi32), ("key_end", _pi32), ("key_j", _pi32),
        ("key_r", _pi32),
        ("qoff", _pi64), ("qdir", _pi32), ("qcomp", _pu8),
        ("qlen", _pi32), ("toff", _pi64), ("tlen", _pi32), ("u8c", _pu8),
    ]


_proto_done = False


def _lib():
    global _proto_done
    lib = get_lib()
    if not _proto_done:
        lib.rt_dedup_patch_batch.restype = None
        lib.rt_dedup_patch_batch.argtypes = [
            POINTER(BnsC), POINTER(MemOptC), POINTER(ReadsC),
            POINTER(RegsC)]
        lib.rt_finalize_se_batch.restype = c_void_p
        lib.rt_finalize_se_batch.argtypes = [
            POINTER(BnsC), POINTER(MemOptC), POINTER(ReadsC),
            POINTER(RegsC), c_int64, c_char_p, c_int64, _pi64, _pi64]
        lib.rt_pestat_batch.restype = None
        lib.rt_pestat_batch.argtypes = [
            POINTER(BnsC), POINTER(MemOptC), POINTER(RegsC), c_int64,
            POINTER(ctypes.c_double)]
        lib.rt_rescue_pre_batch.restype = POINTER(RescueOutC)
        lib.rt_rescue_pre_batch.argtypes = [
            POINTER(BnsC), POINTER(MemOptC), POINTER(ReadsC),
            POINTER(RegsC), POINTER(ctypes.c_double), c_int64]
        lib.rt_sam_pe_batch.restype = c_void_p
        lib.rt_sam_pe_batch.argtypes = [
            POINTER(BnsC), POINTER(MemOptC), POINTER(ReadsC),
            POINTER(RegsC), POINTER(ctypes.c_double), c_int64, c_int64,
            _pi32, _pi32, _pi32, _pi32, _pi32, c_char_p, c_int64,
            _pi64, _pi64]
        lib.rt_smems_pivots.restype = POINTER(SmemsOutC)
        lib.rt_smems_pivots.argtypes = [
            POINTER(FmiC), np.ctypeslib.ndpointer(np.uint8,
                                                  flags="C_CONTIGUOUS"),
            _pi64, c_int64, _pi32, _pi32, _pi64, c_int32]
        lib.rt_sa_entries.restype = None
        lib.rt_sa_entries.argtypes = [
            POINTER(FmiC),
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            _pi64, c_int64, _pi64]
        lib.rt_collect_smems_reads.restype = POINTER(SmemsOutC)
        lib.rt_collect_smems_reads.argtypes = [
            POINTER(FmiC), np.ctypeslib.ndpointer(np.uint8,
                                                  flags="C_CONTIGUOUS"),
            _pi64, c_int64, _pi32, c_int32, c_int32, c_int64, c_int64]
        lib.rt_ext_begin.restype = c_void_p
        lib.rt_ext_begin.argtypes = [
            POINTER(BnsC), POINTER(MemOptC), POINTER(ReadsC),
            _pi64, _pi32, _pu8, _pf32, _pi32, _pi64, _pi64, _pi32, _pi32,
            c_int32, c_int32]
        lib.rt_ext_pending.restype = c_int64
        lib.rt_ext_pending.argtypes = [
            c_void_p, c_int32, _pi64, _pi32, _pi32, _pi64, _pi32, _pi32,
            _pi32, _pi32]
        lib.rt_ext_apply.restype = c_int64
        lib.rt_ext_apply.argtypes = [c_void_p, c_int32, _pi32]
        lib.rt_ext_nregs.restype = c_int64
        lib.rt_ext_nregs.argtypes = [c_void_p]
        lib.rt_ext_finish.restype = None
        lib.rt_ext_finish.argtypes = [c_void_p, POINTER(RegsC)]
        lib.rt_ext_free.restype = None
        lib.rt_ext_free.argtypes = [c_void_p]
        lib.rt_ext_max_band_try.restype = c_int32
        lib.rt_ext_max_band_try.argtypes = []
        lib.rt_free.restype = None
        lib.rt_free.argtypes = [c_void_p]
        _proto_done = True
    return lib


def extension_batch(fm, opt, reads, chains_flat, score_fn) -> FlatRegs:
    """mem_chain2aln_across_reads_V2 with the gather/acceptance/purge in
    C++ and the banded-SW scoring via `score_fn(side, desc_dict, w,
    end_bonus) -> int32[n, 6]` (the device kernel); over-cap pairs run the
    scalar kernel inside rt_ext_apply.  Returns the chunk's FlatRegs
    (pre-dedup, qe > qb survivors only)."""
    (chain_off, chain_rid, chain_alt, chain_frac, chain_nseeds, soff,
     seed_rbeg, seed_qbeg, seed_len) = chains_flat
    from ..ops.bsw import QCAP, TCAP
    lib = _lib()
    bv = bns_view(fm)
    oc = make_opt_c(opt)
    rv = reads_view(reads)
    ca = lambda a, dt: np.ascontiguousarray(a, dt)
    chain_off = ca(chain_off, np.int64)
    chain_rid = ca(chain_rid, np.int32)
    chain_alt = ca(chain_alt, np.uint8)
    chain_frac = ca(chain_frac, np.float32)
    chain_nseeds = ca(chain_nseeds, np.int32)
    soff = ca(soff, np.int64)
    seed_rbeg = ca(seed_rbeg, np.int64)
    seed_qbeg = ca(seed_qbeg, np.int32)
    seed_len = ca(seed_len, np.int32)
    h = lib.rt_ext_begin(
        ctypes.byref(bv.c), ctypes.byref(oc), ctypes.byref(rv.c),
        chain_off.ctypes.data_as(_pi64), chain_rid.ctypes.data_as(_pi32),
        chain_alt.ctypes.data_as(_pu8),
        chain_frac.ctypes.data_as(_pf32),
        chain_nseeds.ctypes.data_as(_pi32), soff.ctypes.data_as(_pi64),
        seed_rbeg.ctypes.data_as(_pi64), seed_qbeg.ctypes.data_as(_pi32),
        seed_len.ctypes.data_as(_pi32), QCAP, TCAP)
    try:
        max_try = lib.rt_ext_max_band_try()
        # NOTE the sides are SEQUENTIAL, not independent: right-side pairs
        # take the left side's FINAL region score as their h0
        # (rt_ext_pending's right_ready latch; bwamem.cpp:2641-2658), so
        # the left band-doubling rounds must fully complete first.
        for side in (0, 1):
            end_bonus = opt.pen_clip5 if side == 0 else opt.pen_clip3
            rem = 0
            for rnd in range(max_try):
                n = lib.rt_ext_pending(h, side, None, None, None, None,
                                       None, None, None, None)
                if rnd > 0 and 0 < n < 768:
                    # band-doubling retries are rare; a small retry batch
                    # costs less on the host scalar kernel than a device
                    # dispatch + fetch round trip (~27ms on the tunnel)
                    PROF.count("ext.host_retry", int(n))
                    rem = lib.rt_ext_apply(h, side, None)
                    if rem == 0:
                        break
                    continue
                scores = np.zeros((0, 6), np.int32)
                if n:
                    d = dict(qoff=np.zeros(n, np.int64),
                             qdir=np.zeros(n, np.int32),
                             qlen=np.zeros(n, np.int32),
                             toff=np.zeros(n, np.int64),
                             tdir=np.zeros(n, np.int32),
                             tlen=np.zeros(n, np.int32),
                             h0=np.zeros(n, np.int32),
                             seqid=np.zeros(n, np.int32))
                    lib.rt_ext_pending(
                        h, side, d["qoff"].ctypes.data_as(_pi64),
                        d["qdir"].ctypes.data_as(_pi32),
                        d["qlen"].ctypes.data_as(_pi32),
                        d["toff"].ctypes.data_as(_pi64),
                        d["tdir"].ctypes.data_as(_pi32),
                        d["tlen"].ctypes.data_as(_pi32),
                        d["h0"].ctypes.data_as(_pi32),
                        d["seqid"].ctypes.data_as(_pi32))
                    scores = np.ascontiguousarray(
                        score_fn(side, d, opt.w << rnd, end_bonus),
                        np.int32)
                rem = lib.rt_ext_apply(h, side,
                                       scores.ctypes.data_as(_pi32))
                if rem == 0:
                    break
            if rem:
                raise RuntimeError("extension pairs left pending after "
                                   "the final band-doubling round")
        n_regs = lib.rt_ext_nregs(h)
        fr = FlatRegs(len(reads), int(n_regs))
        rc = fr.c_struct()
        lib.rt_ext_finish(h, ctypes.byref(rc))
        n_used = int(fr.off[-1])
        # trim the over-allocation (purged/sentinel regions dropped)
        for f in ("rb", "re") + _I32_FIELDS + ("frac_rep",):
            setattr(fr, f, getattr(fr, f)[:n_used])
        return fr
    finally:
        lib.rt_ext_free(h)


def fmi_view(fm) -> FmiC:
    """FmiC over the loaded index arrays (cached on the FMIndex)."""
    v = getattr(fm, "_fmi_view", None)
    if v is None:
        cc = np.ascontiguousarray(fm.cp_count, np.int64)
        oh = np.ascontiguousarray(fm.one_hot, np.uint64)
        cn = np.ascontiguousarray(fm.counts, np.int64)
        c = FmiC()
        c.counts = cn.ctypes.data_as(_pi64)
        c.cp_count = cc.ctypes.data_as(_pi64)
        c.one_hot = oh.ctypes.data_as(POINTER(ctypes.c_uint64))
        c.sentinel = int(fm.sentinel_index)
        v = (c, cc, oh, cn)   # keep the buffers referenced
        fm._fmi_view = v
    return v[0]


def _smems_out_to_tuples(lib, sop):
    so = sop.contents
    n = so.n
    if n == 0:
        lib.rt_free(sop)
        return []
    arr = lambda p: np.ctypeslib.as_array(p, shape=(n,))
    rid = arr(so.rid).astype(np.int64)
    m = arr(so.m).astype(np.int64)
    nn = arr(so.nn).astype(np.int64)
    k = arr(so.k).copy()
    ll = arr(so.l).copy()
    s = arr(so.s).copy()
    out = [(int(rid[i]), int(m[i]), int(nn[i]), int(k[i]), int(ll[i]),
            int(s[i])) for i in range(n)]
    lib.rt_free(sop)
    return out


def collect_smems_reads(fm, encs, opt) -> list[list[tuple]]:
    """Full 3-round SMEM collection for whole reads in C++ — the
    ultra-long-read path and whole-read fallback (same output as
    align.seeding.collect_smems, parity-tested)."""
    lib = _lib()
    fc = fmi_view(fm)
    blob = np.ascontiguousarray(np.concatenate(encs), np.uint8) \
        if encs else np.zeros(0, np.uint8)
    off = _offsets([len(e) for e in encs])
    rids = np.arange(len(encs), dtype=np.int32)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    sop = lib.rt_collect_smems_reads(
        ctypes.byref(fc), blob, off.ctypes.data_as(_pi64), len(encs),
        rids.ctypes.data_as(_pi32), opt.min_seed_len, split_len,
        int(opt.split_width), int(opt.max_mem_intv))
    tuples = _smems_out_to_tuples(lib, sop)
    per_read: list[list[tuple]] = [[] for _ in encs]
    for t in tuples:
        per_read[t[0]].append(t)
    return per_read


def sa_entries_host(fm, positions: np.ndarray) -> np.ndarray:
    """Host-native SA resolution (get_sa_entries batch) — the patch-path
    stand-in for the device sa_lookup kernel."""
    lib = _lib()
    fc = fmi_view(fm)
    pos = np.ascontiguousarray(positions, np.int64)
    out = np.zeros(len(pos), np.int64)
    ms = np.ascontiguousarray(fm.sa_ms_byte, np.int8)
    ls = np.ascontiguousarray(fm.sa_ls_word, np.uint32)
    lib.rt_sa_entries(ctypes.byref(fc), ms, ls,
                      pos.ctypes.data_as(_pi64), len(pos),
                      out.ctypes.data_as(_pi64))
    return out


def smems_pivots(fm, encs, prid, px, min_intv, min_seed_len: int):
    """Exact smems_one_pos over a batch of pivots (the device-cap overflow
    fallback).  Returns a list of (rid, m, n, k, l, s) tuples."""
    lib = _lib()
    fc = fmi_view(fm)
    blob = np.ascontiguousarray(np.concatenate(encs), np.uint8) \
        if encs else np.zeros(0, np.uint8)
    off = _offsets([len(e) for e in encs])
    prid = np.ascontiguousarray(prid, np.int32)
    px = np.ascontiguousarray(px, np.int32)
    mi = np.ascontiguousarray(min_intv, np.int64)
    sop = lib.rt_smems_pivots(ctypes.byref(fc), blob,
                              off.ctypes.data_as(_pi64), len(prid),
                              prid.ctypes.data_as(_pi32),
                              px.ctypes.data_as(_pi32),
                              mi.ctypes.data_as(_pi64), min_seed_len)
    so = sop.contents
    n = so.n
    if n == 0:
        lib.rt_free(sop)
        return []
    arr = lambda p, dt: np.ctypeslib.as_array(p, shape=(n,)).astype(
        dt, copy=True)
    rid = arr(so.rid, np.int64)
    m = arr(so.m, np.int64)
    nn = arr(so.nn, np.int64)
    k = arr(so.k, np.int64)
    ll = arr(so.l, np.int64)
    s = arr(so.s, np.int64)
    lib.rt_free(sop)
    return [(int(rid[i]), int(m[i]), int(nn[i]), int(k[i]), int(ll[i]),
             int(s[i])) for i in range(n)]


def _offsets(lens) -> np.ndarray:
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    return off


def make_opt_c(opt) -> MemOptC:
    o = MemOptC()
    for name in ("a", "b", "o_del", "e_del", "o_ins", "e_ins",
                 "pen_unpaired", "pen_clip5", "pen_clip3", "w", "zdrop", "T",
                 "flag", "min_seed_len", "max_matesw", "max_XA_hits",
                 "max_XA_hits_alt", "mapQ_coef_fac", "max_chain_gap",
                 "max_ins"):
        setattr(o, name, int(getattr(opt, name)))
    o.verbose = int(getattr(opt, "verbose", 3))
    for name in ("mask_level", "drop_ratio", "XA_drop_ratio",
                 "mask_level_redun", "mapQ_coef_len"):
        setattr(o, name, float(getattr(opt, name)))
    o.mat = (c_int8 * 25)(*opt.mat)
    return o


class BnsView:
    """Keeps the numpy/bytes buffers referenced for the BnsC lifetime."""

    def __init__(self, fm):
        bns = fm.bns
        n = len(bns.anns)
        self.ann_off = np.array([a.offset for a in bns.anns], np.int64)
        self.ann_len = np.array([a.length for a in bns.anns], np.int64)
        self.ann_alt = np.array([1 if a.is_alt else 0 for a in bns.anns],
                                np.uint8)
        names = [a.name.encode() for a in bns.anns]
        annos = [(a.anno or "").encode() for a in bns.anns]
        self.name_blob = b"".join(names)
        self.name_off = _offsets([len(s) for s in names])
        self.anno_blob = b"".join(annos)
        self.anno_off = _offsets([len(s) for s in annos])
        self.ref = np.ascontiguousarray(fm.ref_string, np.uint8)
        c = BnsC()
        c.l_pac = fm.l_pac
        c.n_anns = n
        c.ann_off = self.ann_off.ctypes.data_as(_pi64)
        c.ann_len = self.ann_len.ctypes.data_as(_pi64)
        c.ann_alt = self.ann_alt.ctypes.data_as(_pu8)
        c.name_blob = self.name_blob
        c.name_off = self.name_off.ctypes.data_as(_pi64)
        c.anno_blob = self.anno_blob
        c.anno_off = self.anno_off.ctypes.data_as(_pi64)
        c.ref = self.ref.ctypes.data_as(_pu8)
        self.c = c


def bns_view(fm) -> BnsView:
    v = getattr(fm, "_bns_view", None)
    if v is None:
        v = BnsView(fm)
        fm._bns_view = v
    return v


_rv_tls = None


def reads_view(reads) -> "ReadsView":
    """Per-chunk ReadsView memo (thread-local, single slot): the blob
    joins are O(chunk bytes) and the four chunk-batched entry points would
    otherwise each rebuild byte-identical views."""
    global _rv_tls
    import threading
    if _rv_tls is None:
        _rv_tls = threading.local()
    c = getattr(_rv_tls, "v", None)
    if c is not None and c[0] is reads:
        return c[1]
    v = ReadsView(reads)
    _rv_tls.v = (reads, v)
    return v


class ReadsView:
    def __init__(self, reads):
        names = [r.name.encode() for r in reads]
        seqs = [r.seq.encode() for r in reads]
        quals = [(r.qual or "").encode() for r in reads]
        comments = [(r.comment or "").encode() for r in reads]
        self.bufs = (b"".join(names), b"".join(seqs), b"".join(quals),
                     b"".join(comments))
        self.offs = (_offsets([len(s) for s in names]),
                     _offsets([len(s) for s in seqs]),
                     _offsets([len(s) for s in quals]),
                     _offsets([len(s) for s in comments]))
        c = ReadsC()
        c.n = len(reads)
        c.name_blob, c.seq_blob, c.qual_blob, c.comment_blob = self.bufs
        c.name_off = self.offs[0].ctypes.data_as(_pi64)
        c.seq_off = self.offs[1].ctypes.data_as(_pi64)
        c.qual_off = self.offs[2].ctypes.data_as(_pi64)
        c.comment_off = self.offs[3].ctypes.data_as(_pi64)
        self.c = c


_I32_FIELDS = ("qb", "qe", "rid", "score", "truesc", "sub", "alt_sc",
               "csub", "sub_n", "w", "seedcov", "secondary",
               "secondary_all", "seedlen0", "n_comp", "is_alt")


class FlatRegs:
    """Chunk-wide flat AlnReg SoA (mem_alnreg_t arrays)."""

    def __init__(self, n_reads: int, n_regs: int):
        self.off = np.zeros(n_reads + 1, np.int64)
        self.rb = np.zeros(n_regs, np.int64)
        self.re = np.zeros(n_regs, np.int64)
        for f in _I32_FIELDS:
            setattr(self, f, np.zeros(n_regs, np.int32))
        self.frac_rep = np.zeros(n_regs, np.float32)

    @classmethod
    def from_lists(cls, regs_per_read) -> "FlatRegs":
        """Flatten per-read AlnReg object lists (entries with qe > qb only,
        matching the sentinel filter at bwamem.cpp:1141-1147)."""
        kept = [[r for r in regs if r.qe > r.qb] for regs in regs_per_read]
        n = sum(len(k) for k in kept)
        fr = cls(len(kept), n)
        j = 0
        for i, regs in enumerate(kept):
            for r in regs:
                fr.rb[j] = r.rb
                fr.re[j] = r.re
                fr.qb[j] = r.qb
                fr.qe[j] = r.qe
                fr.rid[j] = r.rid
                fr.score[j] = r.score
                fr.truesc[j] = r.truesc
                fr.sub[j] = r.sub
                fr.alt_sc[j] = r.alt_sc
                fr.csub[j] = r.csub
                fr.sub_n[j] = r.sub_n
                fr.w[j] = r.w
                fr.seedcov[j] = r.seedcov
                fr.secondary[j] = r.secondary
                fr.secondary_all[j] = r.secondary_all
                fr.seedlen0[j] = r.seedlen0
                fr.n_comp[j] = r.n_comp
                fr.is_alt[j] = r.is_alt
                fr.frac_rep[j] = r.frac_rep
                j += 1
            fr.off[i + 1] = j
        return fr

    def to_lists(self):
        """Back to per-read AlnReg object lists (PE path interop)."""
        from ..align.extend import AlnReg
        out = []
        for i in range(len(self.off) - 1):
            regs = []
            for j in range(int(self.off[i]), int(self.off[i + 1])):
                regs.append(AlnReg(
                    rb=int(self.rb[j]), re=int(self.re[j]),
                    qb=int(self.qb[j]), qe=int(self.qe[j]),
                    rid=int(self.rid[j]), score=int(self.score[j]),
                    truesc=int(self.truesc[j]), sub=int(self.sub[j]),
                    alt_sc=int(self.alt_sc[j]), csub=int(self.csub[j]),
                    sub_n=int(self.sub_n[j]), w=int(self.w[j]),
                    seedcov=int(self.seedcov[j]),
                    secondary=int(self.secondary[j]),
                    secondary_all=int(self.secondary_all[j]),
                    seedlen0=int(self.seedlen0[j]),
                    n_comp=int(self.n_comp[j]),
                    is_alt=int(self.is_alt[j]),
                    frac_rep=float(self.frac_rep[j])))
            out.append(regs)
        return out

    def c_struct(self) -> RegsC:
        c = RegsC()
        c.off = self.off.ctypes.data_as(_pi64)
        c.rb = self.rb.ctypes.data_as(_pi64)
        c.re = self.re.ctypes.data_as(_pi64)
        for f in _I32_FIELDS:
            setattr(c, f, getattr(self, f).ctypes.data_as(_pi32))
        c.frac_rep = self.frac_rep.ctypes.data_as(_pf32)
        return c


def dedup_patch_batch(fm, opt, reads, fr: FlatRegs) -> None:
    """mem_sort_dedup_patch + ALT marking over the chunk, in place."""
    lib = _lib()
    bv = bns_view(fm)
    oc = make_opt_c(opt)
    rv = reads_view(reads)
    rc = fr.c_struct()
    lib.rt_dedup_patch_batch(ctypes.byref(bv.c), ctypes.byref(oc),
                             ctypes.byref(rv.c), ctypes.byref(rc))


def pestat_batch(fm, opt, fr: FlatRegs, verbose: int = 3) -> np.ndarray:
    """mem_pestat over the flat regions; returns the 4x6 stats array
    {failed, low, high, avg, std, n_raw} consumed by the PE entries below.
    Prints the reference's [PE] lines at verbose >= 3."""
    import sys
    lib = _lib()
    bv = bns_view(fm)
    oc = make_opt_c(opt)
    rc = fr.c_struct()
    out = np.zeros((4, 6), np.float64)
    lib.rt_pestat_batch(ctypes.byref(bv.c), ctypes.byref(oc),
                        ctypes.byref(rc), len(fr.off) - 1,
                        out.ctypes.data_as(POINTER(ctypes.c_double)))
    if verbose >= 3:
        for d in range(4):
            if out[d, 5] >= 10:
                print(f"[PE] orientation {'FF FR RF RR'.split()[d]}: "
                      f"n={int(out[d, 5])} mean={out[d, 3]:.2f} "
                      f"std={out[d, 4]:.2f} "
                      f"bounds=({int(out[d, 1])},{int(out[d, 2])})",
                      file=sys.stderr)
    return out


def pes_to_stats(pes) -> np.ndarray:
    """PEStat list (e.g. -I override) -> the 4x6 stats array."""
    out = np.zeros((4, 6), np.float64)
    for d, p in enumerate(pes):
        out[d] = (p.failed, p.low, p.high, p.avg, p.std, 0)
    return out


def rescue_pre_batch(fm, opt, reads, fr: FlatRegs, pes6: np.ndarray,
                     L: int):
    """Collect the chunk's mate-rescue SW problems as device descriptors.
    Returns (desc dict for ops.kswv.DeviceKswv.align_batch, keys arrays)
    or (None, None) when there is nothing to rescue."""
    lib = _lib()
    bv = bns_view(fm)
    oc = make_opt_c(opt)
    rv = reads_view(reads)
    rc = fr.c_struct()
    rop = lib.rt_rescue_pre_batch(
        ctypes.byref(bv.c), ctypes.byref(oc), ctypes.byref(rv.c),
        ctypes.byref(rc),
        np.ascontiguousarray(pes6).ctypes.data_as(
            POINTER(ctypes.c_double)), L)
    ro = rop.contents
    n = ro.n
    if n == 0:
        lib.rt_free(rop)
        return None, None

    def arr(p, dt):
        return np.ctypeslib.as_array(p, shape=(n,)).astype(dt, copy=True)

    keys = dict(key_p=arr(ro.key_p, np.int32),
                key_end=arr(ro.key_end, np.int32),
                key_j=arr(ro.key_j, np.int32),
                key_r=arr(ro.key_r, np.int32))
    desc = dict(qoff=arr(ro.qoff, np.int64).astype(np.int32),
                qdir=arr(ro.qdir, np.int32),
                qcomp=arr(ro.qcomp, np.uint8).astype(bool),
                qlen=arr(ro.qlen, np.int32),
                toff=arr(ro.toff, np.int64),
                tlen=arr(ro.tlen, np.int32),
                u8=arr(ro.u8c, np.uint8).astype(bool))
    lib.rt_free(rop)

    # host-fallback sequence providers for non-u8-class / saturated lanes
    # (DeviceKswv.align_batch consumes these; ops/kswv.py:330-347)
    from ..index.io import NT4_TABLE

    def enc_host(i, ql):
        row = int(desc["qoff"][i]) // L
        ms = NT4_TABLE[np.frombuffer(reads[row].seq.encode(), np.uint8)]
        if desc["qdir"][i] < 0:
            return np.array([3 - int(c) if c < 4 else 4 for c in ms[::-1]],
                            np.uint8)
        return np.ascontiguousarray(ms)

    def ref_host(i, tl):
        t0 = int(desc["toff"][i])
        return np.ascontiguousarray(fm.ref_string[t0:t0 + tl])

    desc["enc_host"] = enc_host
    desc["ref_host"] = ref_host
    return desc, keys


def sam_pe_batch(fm, opt, reads, fr: FlatRegs, pes6: np.ndarray,
                 n_processed: int, rg_id: str | None,
                 keys=None, res7: np.ndarray | None = None) -> list[bytes]:
    """mem_sam_pe over all pairs of the chunk; returns per-read SAM text."""
    lib = _lib()
    bv = bns_view(fm)
    oc = make_opt_c(opt)
    rv = reads_view(reads)
    rc = fr.c_struct()
    per_len = np.zeros(len(reads), np.int64)
    out_len = c_int64()
    rg = rg_id.encode() if rg_id else None
    if keys is not None and res7 is not None:
        n_res = len(keys["key_p"])
        kp = np.ascontiguousarray(keys["key_p"], np.int32)
        ke = np.ascontiguousarray(keys["key_end"], np.int32)
        kj = np.ascontiguousarray(keys["key_j"], np.int32)
        kr = np.ascontiguousarray(keys["key_r"], np.int32)
        rr = np.ascontiguousarray(res7, np.int32)
    else:
        n_res = 0
        kp = ke = kj = kr = rr = np.zeros(0, np.int32)
    ptr = lib.rt_sam_pe_batch(
        ctypes.byref(bv.c), ctypes.byref(oc), ctypes.byref(rv.c),
        ctypes.byref(rc),
        np.ascontiguousarray(pes6).ctypes.data_as(
            POINTER(ctypes.c_double)),
        n_processed >> 1, n_res,
        kp.ctypes.data_as(_pi32), ke.ctypes.data_as(_pi32),
        kj.ctypes.data_as(_pi32), kr.ctypes.data_as(_pi32),
        rr.ctypes.data_as(_pi32), rg, len(rg) if rg else 0,
        per_len.ctypes.data_as(_pi64), ctypes.byref(out_len))
    if not ptr:
        raise RuntimeError("paired reads have different names")
    blob = ctypes.string_at(ptr, out_len.value)
    lib.rt_free(ptr)
    out = []
    pos = 0
    for ln in per_len.tolist():
        out.append(blob[pos:pos + ln])
        pos += ln
    return out


def finalize_se_batch(fm, opt, reads, fr: FlatRegs, n_processed: int,
                      rg_id: str | None) -> list[bytes]:
    """mem_mark_primary_se + mem_reg2sam for the chunk; returns per-read
    SAM text (bytes, possibly multi-line)."""
    lib = _lib()
    bv = bns_view(fm)
    oc = make_opt_c(opt)
    rv = reads_view(reads)
    rc = fr.c_struct()
    per_len = np.zeros(len(reads), np.int64)
    out_len = c_int64()
    rg = rg_id.encode() if rg_id else None
    ptr = lib.rt_finalize_se_batch(
        ctypes.byref(bv.c), ctypes.byref(oc), ctypes.byref(rv.c),
        ctypes.byref(rc), n_processed, rg, len(rg) if rg else 0,
        per_len.ctypes.data_as(_pi64), ctypes.byref(out_len))
    blob = ctypes.string_at(ptr, out_len.value)
    lib.rt_free(ptr)
    out = []
    pos = 0
    for ln in per_len.tolist():
        out.append(blob[pos:pos + ln])
        pos += ln
    return out
