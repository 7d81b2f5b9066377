"""Sheared-band long-read extension kernel: bit-identity vs the full-width
device kernel (_bsw_dp) and the native scalar spec on realistic long pairs.

The shear stores the DP band along an offset axis (ops/bsw.py:_bsw_shear_dp);
any off-by-one in the frame bookkeeping (H unshifted, E shifted, entering
column init, band-shrink translation) breaks score/endpoint equality, so
these tests sweep mutation/indel-heavy pairs at several scales and bands.
"""

import numpy as np
import pytest

from bwamem2_tpu.native import bsw_extend_batch
from bwamem2_tpu.ops.bsw import bsw_kernel, bsw_shear_kernel


def _mutate(rng, seq, err):
    """~err errors: 60% substitutions, 20% ins, 20% del (pacbio-like)."""
    out = []
    for c in seq:
        r = rng.random()
        if r < err * 0.6:
            out.append(rng.integers(0, 4))
        elif r < err * 0.8:
            out.append(rng.integers(0, 4))
            out.append(c)
        elif r < err:
            continue
        else:
            out.append(c)
    return np.array(out, np.uint8)


def _make_pairs(rng, n, qmin, qmax, err):
    qs, ts = [], []
    for _ in range(n):
        ql = int(rng.integers(qmin, qmax))
        t = rng.integers(0, 4, ql + int(rng.integers(0, 200)),
                         dtype=np.uint8)
        q = _mutate(rng, t[: ql], err)[: ql]
        if len(q) == 0:
            q = t[:1].copy()
        qs.append(q)
        ts.append(t)
    return qs, ts


def _tile(seqs, width):
    out = np.full((len(seqs), width), 4, np.int8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def _run_both(qs, ts, w, h0, zdrop=100, end_bonus=5):
    import jax.numpy as jnp
    n = len(qs)
    qlen = np.array([len(q) for q in qs], np.int32)
    tlen = np.array([len(t) for t in ts], np.int32)
    Qmax = int(qlen.max())
    Tmax = int(tlen.max())
    q = _tile(qs, Qmax)
    t = _tile(ts, Tmax)
    h0v = np.asarray(h0, np.int32) if np.ndim(h0) else \
        np.full(n, h0, np.int32)
    wv = np.full(n, w, np.int32)
    args = (1, 4, 6, 1, 6, 1, zdrop, end_bonus, 1)
    full = np.asarray(bsw_kernel(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(h0v), jnp.asarray(wv), *args,
        1 << 30))
    W = 2 * w + 2
    W = ((W + 127) // 128) * 128
    shear = np.asarray(bsw_shear_kernel(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(h0v), jnp.asarray(wv), 1, 4,
        w, W, 6, 1, 6, 1, zdrop, end_bonus, 1))
    return full, shear


@pytest.mark.parametrize("w", [100, 200])
def test_shear_matches_full_width(w):
    rng = np.random.default_rng(7 + w)
    qs, ts = _make_pairs(rng, 24, 50, 1500, 0.10)
    h0 = rng.integers(17, 4000, len(qs))
    full, shear = _run_both(qs, ts, w, h0)
    np.testing.assert_array_equal(full, shear)


def test_shear_edge_cases():
    rng = np.random.default_rng(11)
    # tiny queries vs long targets (empty-band early rows), tlen >> qlen,
    # single-char sequences, exact matches, all-mismatch
    qs = [np.array([1], np.uint8),
          rng.integers(0, 4, 5).astype(np.uint8),
          rng.integers(0, 4, 300).astype(np.uint8),
          np.zeros(200, np.uint8),
          np.full(64, 3, np.uint8)]
    ts = [rng.integers(0, 4, 900).astype(np.uint8),
          rng.integers(0, 4, 1200).astype(np.uint8),
          qs[2].copy(),
          np.ones(800, np.uint8),
          np.full(64, 3, np.uint8)]
    h0 = [19, 19, 300, 40, 64]
    full, shear = _run_both(qs, ts, 100, h0)
    np.testing.assert_array_equal(full, shear)


def test_shear_no_zdrop():
    rng = np.random.default_rng(13)
    qs, ts = _make_pairs(rng, 8, 100, 600, 0.15)
    full, shear = _run_both(qs, ts, 100, 50, zdrop=0)
    np.testing.assert_array_equal(full, shear)


def test_shear_matches_native_scalar():
    """Direct differential vs the C++ scalarBandedSWA port on long pairs."""
    rng = np.random.default_rng(17)
    qs, ts = _make_pairs(rng, 16, 500, 4000, 0.10)
    h0 = rng.integers(17, 2000, len(qs))
    _, shear = _run_both(qs, ts, 100, h0)
    n = len(qs)
    ref_len = np.array([len(t) for t in ts], np.int32)
    qer_len = np.array([len(q) for q in qs], np.int32)
    ref_off = np.zeros(n, np.int64)
    qer_off = np.zeros(n, np.int64)
    np.cumsum(ref_len[:-1], out=ref_off[1:])
    np.cumsum(qer_len[:-1], out=qer_off[1:])
    mat = np.array([1, -4, -4, -4, -1,
                    -4, 1, -4, -4, -1,
                    -4, -4, 1, -4, -1,
                    -4, -4, -4, 1, -1,
                    -1, -1, -1, -1, -1], np.int8)
    host = bsw_extend_batch(
        np.concatenate(ts).astype(np.uint8), ref_off, ref_len,
        np.concatenate(qs).astype(np.uint8), qer_off, qer_len,
        np.asarray(h0, np.int32), 100, mat, 6, 1, 6, 1, 100, 5)
    np.testing.assert_array_equal(np.asarray(host), shear)


# ---------------------------------------------------------------------------
# production routing: the long class through DeviceBSW / DeviceBackend
# ---------------------------------------------------------------------------

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import DATA, FIXTURES  # noqa: E402

PREFIX = os.path.join(FIXTURES, "ref_small.fa")


def _long_read(fm, rng, n, err=0.08):
    pos = int(rng.integers(0, fm.l_pac - n - 10))
    return _mutate(rng, fm.ref_string[pos:pos + n].astype(np.uint8),
                   err)[: n]


def test_device_bsw_long_class_matches_host():
    """Descriptor pairs beyond (QCAP, TCAP) route to the sheared kernel and
    match the native host kernel bit-for-bit through DeviceBSW._run."""
    import jax.numpy as jnp
    from bwamem2_tpu.align.extend import _Pair, native_bsw_kernel_factory
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.bsw import DeviceBSW, QCAP, TCAP
    from bwamem2_tpu.ops.device_index import DeviceFMIndex
    from bwamem2_tpu.utils.profiling import PROF

    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize("pacbio")
    dfm = DeviceFMIndex.from_host(fm)
    bsw = DeviceBSW(dfm, opt)
    rng = np.random.default_rng(3)
    L = 1288
    grid = np.full((4, L), 4, np.int8)
    pending = []
    for i in range(4):
        qlen = int(rng.integers(900, L))
        q = _long_read(fm, rng, qlen)
        grid[i, : len(q)] = q
        toff = int(rng.integers(0, fm.l_pac - 2000))
        tlen = len(q) + int(rng.integers(0, 180))
        ref = fm.ref_string[toff:toff + tlen].astype(np.uint8)
        assert len(q) > QCAP or tlen > TCAP
        pending.append(_Pair(ref=ref.copy(), qer=q.copy(),
                             h0=int(rng.integers(19, 400)), regid=0,
                             seqid=i, qoff=0, qdir=1, toff=toff, tdir=1,
                             qlen=len(q), tlen=tlen))
    bsw.encj = jnp.asarray(grid)
    PROF.c.pop("overflow.bsw_host_tail", None)
    dev = bsw._run(pending, opt.w, opt, opt.pen_clip5)
    assert PROF.c.get("overflow.bsw_host_tail", 0) == 0
    host = native_bsw_kernel_factory("pen_clip5")(pending, opt.w, opt)
    np.testing.assert_array_equal(dev, np.asarray(host))


def test_long_read_e2e_device_backend_matches_oracle():
    """One ~1.3kb 8%-error read through the full DeviceBackend pipeline
    (device seeding via the scaled pivot cap + sheared extension) must
    produce the same SAM as the pure host-oracle Aligner."""
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend

    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize("pacbio")
    rng = np.random.default_rng(9)

    class R:
        def __init__(self, seq):
            self.name = "lr"
            self.seq = "".join("ACGTN"[c] for c in seq)
            self.qual = "I" * len(seq)
            self.comment = None
            self.sam = None

    seq = _long_read(fm, rng, 1350)
    r_dev, r_host = R(seq), R(seq)
    be = DeviceBackend(fm, opt)
    Aligner(fm, opt, backend=be, verbose=0).process([r_dev], 0)
    Aligner(fm, opt, backend=None, verbose=0).process([r_host], 0)
    assert r_dev.sam == r_host.sam
    assert r_dev.sam.split("\t")[5] != "*"


def test_long_classes_covers_all_pairs_at_huge_band():
    """eff = min(tlen, qlen+w+2) can exceed the static T ladder when the
    user passes a huge -w: those pairs must land in the dynamic top rung,
    never be silently dropped."""
    from bwamem2_tpu.ops.bsw import long_classes
    qls = np.array([32000, 150, 8000], np.int32)
    tls = np.array([40000, 700, 8100], np.int32)
    for w in (100, 2000):
        out = long_classes(qls, tls, np.array([0, 1, 2]), w)
        covered = sorted(int(i) for _, _, sel in out for i in sel)
        assert covered == [0, 1, 2]
        for Q, T, sel in out:
            eff = np.minimum(tls[sel], qls[sel] + w + 2)
            assert (eff <= T).all() and (qls[sel] <= Q).all()


def test_pivot_cap_scales_with_read_length():
    from bwamem2_tpu.ops.backend import ROUND1_PIVOT_CAP, pivot_cap
    assert pivot_cap(104) == ROUND1_PIVOT_CAP
    assert pivot_cap(512) == ROUND1_PIVOT_CAP
    assert pivot_cap(8192) >= 8192 // 8
    assert pivot_cap(32000) <= 4096


def test_long_read_golden_device_path_mini():
    """Default-tier slice of the gated golden below: the 4 shortest
    committed pacbio reads (2.1-2.9kb, ~10% error) through the FULL
    DeviceBackend pipeline, SAM bit-identical to the reference binary,
    zero host-tail extensions.  Long-read SAM records are per-read
    independent under the SE pacbio preset, so the subset golden is a
    line-filter of the committed one; only the small shear-ladder rungs
    compile, keeping this in the always-on tier (r4 ADVICE item 3)."""
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.utils.profiling import PROF

    keep = {"pb_17", "pb_3", "pb_21", "pb_14"}
    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize("pacbio")
    allreads = read_chunk(
        FastxReader(os.path.join(DATA, "reads_pacbio.fq")), None, 10**9)
    picked = [(i, r) for i, r in enumerate(allreads) if r.name in keep]
    assert len(picked) == len(keep)
    PROF.c.pop("overflow.bsw_host_tail", None)
    be = DeviceBackend(fm, opt)
    al = Aligner(fm, opt, backend=be, verbose=0)
    # hash_64 tie-breaking keys off the global read id: process each read
    # at its original file position so records match the full-run golden
    for i, r in picked:
        al.process([r], i)
    ours = "".join(r.sam for _, r in picked).splitlines(keepends=True)
    with open(os.path.join(FIXTURES, "golden_pacbio.sam")) as f:
        golden = [l for l in f if not l.startswith("@")
                  and l.split("\t", 1)[0] in keep]
    assert ours == golden
    assert PROF.c.get("overflow.bsw_host_tail", 0) == 0


@pytest.mark.skipif(
    not os.environ.get("BWAMEM2_TPU_SLOW_TESTS"),
    reason="full pacbio golden through the device path (~8 min CPU-XLA "
           "compile; set BWAMEM2_TPU_SLOW_TESTS=1)")
@pytest.mark.parametrize("preset", ["pacbio", "ont2d"])
def test_long_read_golden_device_path(preset):
    """The committed long-read goldens (25 2-8kb ~10% error reads) through
    the FULL DeviceBackend pipeline: SAM bit-identical to the reference
    binary's output, zero host-tail extensions, zero seeding overflows —
    the long-read presets run entirely on device (r3 VERDICT item 6)."""
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.utils.profiling import PROF

    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize(preset)
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_pacbio.fq")),
                       None, 10**9)
    for k in ("overflow.bsw_host_tail", "overflow.r1_pivot_cap"):
        PROF.c.pop(k, None)
    be = DeviceBackend(fm, opt)
    Aligner(fm, opt, backend=be, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    with open(os.path.join(FIXTURES, f"golden_{preset}.sam")) as f:
        golden = [l for l in f if not l.startswith("@")]
    assert ours == golden
    assert PROF.c.get("overflow.bsw_host_tail", 0) == 0
    assert PROF.c.get("overflow.r1_pivot_cap", 0) == 0


def test_device_seeding_long_reads_matches_oracle():
    """2-3kb reads stay on the device seeding path (scaled pivot cap) and
    match the exact host oracle SMEM-for-SMEM."""
    from bwamem2_tpu.align.seeding import collect_smems
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.utils.profiling import PROF

    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize("pacbio")
    be = DeviceBackend(fm, opt)
    rng = np.random.default_rng(21)
    encs = [_long_read(fm, rng, int(n)) for n in (2048, 2900, 2500)]
    PROF.c.pop("overflow.r1_pivot_cap", None)
    dev = be.collect_smems(encs, opt)
    assert PROF.c.get("overflow.r1_pivot_cap", 0) == 0
    host = collect_smems(fm, encs, opt)
    # the device path leaves the unused reverse interval (slot 4) zeroed
    for d, h in zip(dev, host):
        assert [(t[1], t[2], t[3], t[5]) for t in d] \
            == [(t[1], t[2], t[3], t[5]) for t in h]
