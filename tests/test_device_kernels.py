"""Device (JAX) kernels vs the exact host oracle.

Runs on the virtual CPU mesh (conftest).  Each device kernel must reproduce
the host scalar implementation exactly:
  - 3-round SMEM collection (modulo the unused RC-twin field l)
  - batched SA resolution
  - banded-SW extension sextuple (score,qle,tle,gtle,gscore,max_off)
  - end-to-end SAM vs golden fixtures
"""

import os

import numpy as np
import pytest

from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.align.seeding import collect_smems, encode_reads
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MEM_F_PE, MemOptions

from conftest import DATA, FIXTURES

PREFIX = os.path.join(FIXTURES, "ref_small.fa")


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(PREFIX)


@pytest.fixture(scope="module")
def backend(fm):
    from bwamem2_tpu.ops.backend import DeviceBackend
    return DeviceBackend(fm, MemOptions().finalize())


def _reads(n=60):
    return read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                      None, 10**9)[:n]


def drop_l(smems):
    return [(t[0], t[1], t[2], t[3], t[5]) for t in smems]


def test_smem_kernels_match_oracle(fm, backend):
    opt = MemOptions().finalize()
    encs = encode_reads([r.seq for r in _reads()])
    dev = backend.collect_smems(encs, opt)
    host = collect_smems(fm, encs, opt)
    for d, h in zip(dev, host):
        assert drop_l(d) == drop_l(h)


def test_smem_kernels_with_n_bases(fm, backend):
    opt = MemOptions().finalize()
    # synthetic reads with Ns and homopolymers
    rng = np.random.default_rng(7)
    seqs = []
    genome = fm.ref_string[:5000]
    for i in range(24):
        pos = int(rng.integers(0, 4000))
        s = genome[pos:pos + 120].copy()
        s[rng.integers(0, 120, 3)] = 4  # N bases
        seqs.append(bytes(bytearray(s)))
    encs = [np.frombuffer(s, np.uint8).copy() for s in seqs]
    dev = backend.collect_smems(encs, opt)
    host = collect_smems(fm, encs, opt)
    for d, h in zip(dev, host):
        assert drop_l(d) == drop_l(h)


def test_sa_lookup_kernel(fm, backend):
    rng = np.random.default_rng(3)
    pos = rng.integers(0, fm.ref_seq_len, 1000).astype(np.int64)
    got = backend.sa_lookup(pos)
    want = np.array([fm.get_sa_entry(int(p)) for p in pos])
    np.testing.assert_array_equal(got, want)


def test_device_bsw_matches_native(fm, backend):
    from bwamem2_tpu.align.extend import _Pair, native_bsw_kernel_factory
    rng = np.random.default_rng(11)
    opt = MemOptions().finalize()
    pairs = []
    for i in range(60):
        ql = int(rng.integers(1, 128))
        tl = int(rng.integers(1, 250))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        t = rng.integers(0, 4, tl).astype(np.uint8)
        # plant similarity for half the pairs
        if i % 2 == 0:
            n = min(ql, tl)
            t[:n] = q[:n]
            idx = rng.integers(0, n, max(n // 12, 1))
            t[idx] = (t[idx] + 1) % 4
        pairs.append(_Pair(ref=t, qer=q, h0=int(rng.integers(10, 90)),
                           regid=0, seqid=0))
    for w in (100, 200):
        want = native_bsw_kernel_factory("pen_clip5")(pairs, w, opt)
        got = backend.left_bsw_kernel(pairs, w, opt)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_end_to_end_device_backend_golden(fm, backend):
    opt = MemOptions().finalize()
    reads = _reads(300)
    Aligner(fm, opt, backend=backend, verbose=0).process(reads, 0)
    with open(os.path.join(FIXTURES, "golden_se.sam")) as f:
        golden = [l for l in f if not l.startswith("@")]
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    assert ours == golden


def test_device_kswv_matches_native(fm, backend):
    """Batched striped-u8 rescue SW == native ksw_align on random windows."""
    import jax.numpy as jnp
    from bwamem2_tpu.native import ksw_align
    from bwamem2_tpu.ops.kswv import DeviceKswv

    opt = MemOptions().finalize()
    rng = np.random.default_rng(23)
    L = 128
    n = 80
    enc = np.full((n, L), 4, np.int8)
    qoff = np.zeros(n, np.int32)
    qdir = np.zeros(n, np.int32)
    qcomp = np.zeros(n, bool)
    qlen = np.zeros(n, np.int32)
    toff = np.zeros(n, np.int64)
    tlen = np.zeros(n, np.int32)
    ref = fm.ref_string
    for i in range(n):
        ql = int(rng.integers(20, 102))
        tl = int(rng.integers(30, 600))
        tb = int(rng.integers(0, fm.l_pac - tl))
        # half the queries sampled from the window (rescuable), half random
        if i % 2 == 0:
            q = ref[tb + 5: tb + 5 + ql].copy()
            mut = rng.integers(0, ql, 3)
            q[mut] = (q[mut] + 1) % 4
        else:
            q = rng.integers(0, 4, ql).astype(np.uint8)
        if i % 7 == 0:
            q[rng.integers(0, ql)] = 4  # an N
        enc[i, :ql] = q
        rev = i % 3 == 0
        qoff[i] = i * L + (ql - 1 if rev else 0)
        qdir[i] = -1 if rev else 1
        qcomp[i] = rev
        qlen[i] = ql
        toff[i] = tb
        tlen[i] = tl
    desc = dict(qoff=qoff, qdir=qdir, qcomp=qcomp, qlen=qlen, toff=toff,
                tlen=tlen, u8=np.ones(n, bool))
    kw = DeviceKswv(backend.dfm, opt)
    got = kw.align_batch(jnp.asarray(enc), desc)

    mat = np.array(opt.mat, np.int8)
    KSW_XBYTE, KSW_XSUBO, KSW_XSTART = 0x10000, 0x40000, 0x80000
    for i in range(n):
        ql = int(qlen[i])
        q = enc[i, :ql].astype(np.uint8)
        if qdir[i] < 0:
            q = np.array([3 - c if c < 4 else 4 for c in q[::-1]], np.uint8)
        t = np.ascontiguousarray(ref[toff[i]: toff[i] + tlen[i]])
        want = ksw_align(q, t, mat, opt.o_del, opt.e_del, opt.o_ins,
                         opt.e_ins,
                         KSW_XSUBO | KSW_XSTART | KSW_XBYTE
                         | (opt.min_seed_len * opt.a))
        assert got[i].tolist() == list(want), (i, got[i].tolist(), want)


def test_device_kswv_i16_matches_native(fm, backend):
    """Device i16 rescue class (XBYTE off: l_ms*a >= 250) == native
    ksw_align on long random windows (kswv512_16 / ksw_i16 semantics)."""
    import jax.numpy as jnp
    from bwamem2_tpu.native import ksw_align
    from bwamem2_tpu.ops.kswv import DeviceKswv

    opt = MemOptions().finalize()
    rng = np.random.default_rng(31)
    L = 512
    n = 40
    enc = np.full((n, L), 4, np.int8)
    qoff = np.zeros(n, np.int32)
    qdir = np.zeros(n, np.int32)
    qcomp = np.zeros(n, bool)
    qlen = np.zeros(n, np.int32)
    toff = np.zeros(n, np.int64)
    tlen = np.zeros(n, np.int32)
    ref = fm.ref_string
    for i in range(n):
        ql = int(rng.integers(250, 513))      # i16 class: l_ms*a >= 250
        tl = int(rng.integers(300, 2049))
        tb = int(rng.integers(0, fm.l_pac - tl))
        if i % 2 == 0:
            q = ref[tb + 11: tb + 11 + ql].copy()
            mut = rng.integers(0, ql, 12)
            q[mut] = (q[mut] + 1) % 4
        else:
            q = rng.integers(0, 4, ql).astype(np.uint8)
        if i % 5 == 0:
            q[rng.integers(0, ql)] = 4
        enc[i, :ql] = q
        rev = i % 3 == 0
        qoff[i] = i * L + (ql - 1 if rev else 0)
        qdir[i] = -1 if rev else 1
        qcomp[i] = rev
        qlen[i] = ql
        toff[i] = tb
        tlen[i] = tl
    desc = dict(qoff=qoff, qdir=qdir, qcomp=qcomp, qlen=qlen, toff=toff,
                tlen=tlen, u8=np.zeros(n, bool))
    kw = DeviceKswv(backend.dfm, opt)
    got = kw.align_batch(jnp.asarray(enc), desc)

    mat = np.array(opt.mat, np.int8)
    KSW_XSUBO, KSW_XSTART = 0x40000, 0x80000
    for i in range(n):
        ql = int(qlen[i])
        q = enc[i, :ql].astype(np.uint8)
        if qdir[i] < 0:
            q = np.array([3 - c if c < 4 else 4 for c in q[::-1]], np.uint8)
        t = np.ascontiguousarray(ref[toff[i]: toff[i] + tlen[i]])
        want = ksw_align(q, t, mat, opt.o_del, opt.e_del, opt.o_ins,
                         opt.e_ins,
                         KSW_XSUBO | KSW_XSTART
                         | (opt.min_seed_len * opt.a))
        assert got[i].tolist() == list(want), (i, got[i].tolist(), want)


def test_end_to_end_pe_device_backend_golden(fm, backend):
    """PE with the device backend (incl. batched mate rescue) == golden."""
    from bwamem2_tpu.options import MEM_F_PE

    opt = MemOptions()
    opt.flag |= MEM_F_PE
    opt = opt.finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_r1.fq")),
                       FastxReader(os.path.join(DATA, "reads_r2.fq")), 10**9)
    from bwamem2_tpu.ops.backend import DeviceBackend
    be = DeviceBackend(fm, opt)
    from bwamem2_tpu.native import hostrt
    n_batched = [0]
    orig = hostrt.rescue_pre_batch
    def spy(*a, **k):
        desc, keys = orig(*a, **k)
        if keys is not None:
            n_batched[0] += len(keys["key_p"])
        return desc, keys
    hostrt.rescue_pre_batch = spy
    try:
        Aligner(fm, opt, backend=be, verbose=0).process(reads, 0)
    finally:
        hostrt.rescue_pre_batch = orig
    with open(os.path.join(FIXTURES, "golden_pe.sam")) as f:
        golden = [l for l in f if not l.startswith("@")]
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    assert ours == golden
    assert n_batched[0] > 0, "batched rescue path did not fire"


def test_long_read_round3_seed_cap(fm, backend):
    """>=520bp unique reads can emit L//(k+1)+1 round-3 seeds — regression
    for an off-by-one in the per-read output cap (device == oracle)."""
    opt = MemOptions().finalize()
    rng = np.random.default_rng(99)
    encs = []
    for i in range(4):
        pos = int(rng.integers(0, fm.l_pac - 700))
        s = fm.ref_string[pos:pos + 600].copy()
        s[rng.integers(0, 600, 4)] = 4  # a few Ns keep seeds fragmented
        encs.append(s.astype(np.uint8))
    dev = backend.collect_smems(encs, opt)
    host = collect_smems(fm, encs, opt)
    for d, h in zip(dev, host):
        assert drop_l(d) == drop_l(h)


def test_pipeline_worker_error_propagates(fm):
    """A crash inside a compute worker must fail the run, not hang it."""
    import io
    from bwamem2_tpu.runtime import run_pipeline

    class Boom:
        def process(self, reads, base, pes0=None):
            raise RuntimeError("boom")

    ks = FastxReader(os.path.join(DATA, "reads_se.fq"))
    with pytest.raises(RuntimeError, match="boom"):
        run_pipeline(Boom(), ks, None, 1000, io.StringIO(), verbose=0,
                     n_workers=2)


def test_long_read_chunk_after_short_chunk(fm, backend):
    """A >32kb-read chunk after a normal chunk must not reuse the previous
    chunk's device read grid (stale-grid corruption) — runs the host-oracle
    path and matches it exactly."""
    opt = MemOptions().finalize()
    rng = np.random.default_rng(5)
    # normal chunk attaches a read grid
    short = [fm.ref_string[100:201].astype(np.uint8).copy()]
    al = Aligner(fm, opt, backend=backend, verbose=0)

    class R:
        def __init__(self, seq):
            self.name = "r"
            self.seq = "".join("ACGTN"[c] for c in seq)
            self.qual = "I" * len(seq)
            self.comment = None
            self.sam = None

    al.process([R(short[0])], 0)
    # long chunk: must take the oracle path end to end
    pos = int(rng.integers(0, fm.l_pac - 34000))
    long_seq = fm.ref_string[pos:pos + 33000].astype(np.uint8).copy()
    long_seq[rng.integers(0, 33000, 5)] = 1
    r_dev = R(long_seq)
    al.process([r_dev], 0)
    r_host = R(long_seq)
    Aligner(fm, opt, backend=None, verbose=0).process([r_host], 0)
    assert r_dev.sam == r_host.sam
    assert r_dev.sam.split("\t")[5] != "*"  # it actually aligned


def test_packed_ref_bit_identical(fm):
    """2-bit-packed device ref (the human-scale HBM layout) == unpacked."""
    from bwamem2_tpu.options import MEM_F_PE
    from bwamem2_tpu.ops.device_index import DeviceFMIndex
    from bwamem2_tpu.ops.backend import DeviceBackend
    opt = MemOptions()
    opt.flag |= MEM_F_PE
    opt = opt.finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_r1.fq")),
                       FastxReader(os.path.join(DATA, "reads_r2.fq")), 10**9)
    saved = DeviceFMIndex.REF_PACK_MIN
    DeviceFMIndex.REF_PACK_MIN = 0
    try:
        be = DeviceBackend(fm, opt)
        assert be.dfm.ref_packed
        Aligner(fm, opt, backend=be, verbose=0).process(reads, 0)
    finally:
        DeviceFMIndex.REF_PACK_MIN = saved
    with open(os.path.join(FIXTURES, "golden_pe.sam")) as f:
        golden = [l for l in f if not l.startswith("@")]
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    assert ours == golden


def test_occ_hi_plane_above_2gbp():
    """has_hi=True occ arithmetic (counts above 2^32, incl. a hi byte
    >= 128 exercising the int32 sign-bit pack of occ_hi) vs brute force.

    Real fixtures are all small genomes (has_hi=False), so the hi-plane
    gather paths (_cp64 hi, occ_all4 hi4, bwt_char_occ) are covered here
    with a synthetic index built straight through pack_occ_rows."""
    import jax.numpy as jnp
    from bwamem2_tpu.ops.device_index import (DeviceFMIndex, bwt_char_occ,
                                              occ_all4, occ_one,
                                              pack_occ_rows)

    rng = np.random.default_rng(42)
    n = 300                        # 5 blocks, last one partial
    sent = 137
    bwt = rng.integers(0, 4, n).astype(np.int64)
    # checkpoint base offsets push every count above 2^32; hi bytes 131 and
    # 144 set the top bit of their byte (and 144 sits in occ_hi bits 24..31,
    # making the packed int32 negative)
    base = np.array([(3 << 32) | 5, (131 << 32) | 7,
                     (1 << 32) | 11, (144 << 32) | 13], np.int64)
    nb = (n + 63) // 64
    one_hot = np.zeros((nb, 4), np.uint64)
    cp = np.zeros((nb, 4), np.int64)
    run = base.copy()
    for b in range(nb):
        cp[b] = run
        for p in range(64 * b, min(64 * b + 64, n)):
            if p == sent:
                continue
            one_hot[b, bwt[p]] |= np.uint64(1) << np.uint64(63 - (p & 63))
            run[bwt[p]] += 1
    occp, occ_hi = pack_occ_rows(cp, one_hot)
    assert (occ_hi < 0).any()      # the sign-bit pack is actually exercised
    dummy64 = jnp.zeros(1, jnp.int64)
    dfm = DeviceFMIndex(
        occp=jnp.asarray(occp), occ_hi=jnp.asarray(occ_hi),
        counts=jnp.zeros(5, jnp.int64),
        sa_ms=jnp.zeros(1, jnp.int8), sa_ls=jnp.zeros(1, jnp.uint32),
        sentinel=jnp.int64(sent), ref=jnp.zeros(1, jnp.uint8),
        lut_k=dummy64, lut_s=dummy64, has_hi=True)

    def brute(pos, c):
        cnt = sum(1 for p in range(pos) if p != sent and bwt[p] == c)
        return int(base[c]) + cnt

    pos = np.arange(0, n + 1, dtype=np.int64)
    for c in range(4):
        got = np.asarray(occ_one(dfm, jnp.asarray(pos), jnp.int32(c)))
        want = np.array([brute(int(p), c) for p in pos])
        np.testing.assert_array_equal(got, want)
    got4 = np.asarray(occ_all4(dfm, jnp.asarray(pos)))
    for c in range(4):
        np.testing.assert_array_equal(
            got4[:, c], [brute(int(p), c) for p in pos])
    # fused char+occ (SA-walk step): char 4 at the sentinel, occ of the
    # stored char elsewhere
    ch, occ = (np.asarray(a) for a in
               bwt_char_occ(dfm, jnp.asarray(pos[:-1])))
    want_ch = np.where(pos[:-1] == sent, 4, bwt[pos[:-1]])
    np.testing.assert_array_equal(ch, want_ch)
    nsent = pos[:-1] != sent
    want_occ = np.array([brute(int(p), int(bwt[p])) for p in pos[:-1]])
    np.testing.assert_array_equal(occ[nsent], want_occ[nsent])
