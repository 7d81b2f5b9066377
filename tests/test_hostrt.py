"""Native host runtime (runtime.cpp) vs the pure-Python spec path.

The golden tests exercise the native path (Aligner default); these tests pin
the two implementations against each other on the committed fixtures so a
regression in either is caught even where goldens don't cover a flag combo.
"""

import os

import pytest

from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MEM_F_ALL, MEM_F_PE, MemOptions

from conftest import DATA, FIXTURES

PREFIX = os.path.join(FIXTURES, "ref_small.fa")
ALT_PREFIX = os.path.join(FIXTURES, "alt", "ref_small.fa")


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(PREFIX)


def run(fm, opt, se_file="reads_se.fq", pe=False, n_processed=0):
    ks2 = FastxReader(os.path.join(DATA, "reads_r2.fq")) if pe else None
    f1 = "reads_r1.fq" if pe else se_file
    reads = read_chunk(FastxReader(os.path.join(DATA, f1)), ks2, 10**9)
    out = {}
    for native in (False, True):
        rd = [r for r in reads]
        for r in rd:
            r.sam = None
        Aligner(fm, opt, verbose=0, native_rt=native).process(
            rd, n_processed)
        out[native] = "".join(r.sam for r in rd)
    return out


@pytest.mark.parametrize("flags", [
    {},
    {"flag": MEM_F_ALL},
    {"T": 20},
    {"pen_clip5": 3, "pen_clip3": 7},
])
def test_se_native_matches_python(fm, flags):
    opt = MemOptions()
    for k, v in flags.items():
        if k == "flag":
            opt.flag |= v
        else:
            opt.set(k, v)
    opt.finalize()
    out = run(fm, opt)
    assert out[True] == out[False]


def test_se_nonzero_base_offset(fm):
    # n_processed feeds the mark_primary hash: must flow through intact
    opt = MemOptions().finalize()
    out = run(fm, opt, n_processed=12345)
    assert out[True] == out[False]


def test_pe_native_dedup_matches_python(fm):
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    out = run(fm, opt, pe=True)
    assert out[True] == out[False]


def test_alt_contigs_native():
    if not os.path.exists(ALT_PREFIX + ".bwt.2bit.64"):
        pytest.skip("no ALT fixture")
    fm_alt = FMIndex.load(ALT_PREFIX)
    opt = MemOptions().finalize()
    out = run(fm_alt, opt)
    assert out[True] == out[False]


def test_native_smems_pivots_matches_oracle(fm):
    # rt_smems_pivots == align.seeding.smems_one_pos across pivots,
    # min_intv values, N bases, and read boundaries
    import numpy as np
    from bwamem2_tpu.native import hostrt
    from bwamem2_tpu.align.seeding import smems_one_pos
    rng = np.random.default_rng(3)
    encs = []
    for i in range(40):
        p = int(rng.integers(0, fm.l_pac - 120))
        e = fm.ref_string[p:p + 120].astype(np.uint8).copy()
        mut = rng.integers(0, 120, 3)
        e[mut] = rng.integers(0, 5, 3)
        encs.append(e)
    prid, px, mi = [], [], []
    for r in range(40):
        for x in (0, 13, 60, 100, 119):
            for m in (1, 2, 11):
                prid.append(r)
                px.append(x)
                mi.append(m)
    got = hostrt.smems_pivots(fm, encs, np.array(prid), np.array(px),
                              np.array(mi), 19)
    want = []
    for r, x, m in zip(prid, px, mi):
        smems_one_pos(fm, encs[r], r, x, m, 19, want)
    assert sorted(got) == sorted(tuple(int(v) for v in t) for t in want)


def test_native_collect_smems_reads_matches_oracle(fm):
    # rt_collect_smems_reads (3 rounds + sort) == align.seeding spec,
    # including an ultra-long 40kb read (the host-path case)
    import numpy as np
    from bwamem2_tpu.native import hostrt
    from bwamem2_tpu.align.seeding import collect_smems
    rng = np.random.default_rng(11)
    encs = []
    for ln in (101, 150, 1000, 40000, 75):
        p = int(rng.integers(0, fm.l_pac - ln))
        e = fm.ref_string[p:p + ln].astype(np.uint8).copy()
        mut = rng.integers(0, ln, max(ln // 100, 2))
        e[mut] = rng.integers(0, 5, len(mut))
        encs.append(e)
    opt = MemOptions().finalize()
    got = hostrt.collect_smems_reads(fm, encs, opt)
    want = collect_smems(fm, encs, opt)
    for g, w in zip(got, want):
        assert [tuple(int(v) for v in t) for t in g] \
            == [tuple(int(v) for v in t) for t in w]


def test_long_read_pe_rescue_host_fallback(fm):
    # reads with l_ms * a >= 250 make every rescue problem non-u8-class:
    # the device batch must fall back to the host kernel lanes (the
    # enc_host/ref_host providers) instead of crashing; output must match
    # the pure-Python path
    import numpy as np
    from bwamem2_tpu.io.fastq import Read
    from bwamem2_tpu.options import MEM_F_PE
    from bwamem2_tpu.ops.backend import DeviceBackend
    rng = np.random.default_rng(77)
    B = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for i in range(24):
        isize = int(rng.normal(700, 40))
        p = int(rng.integers(0, fm.l_pac - isize))
        frag = "".join(B[c] for c in fm.ref_string[p:p + isize])
        r1 = frag[:300]
        r2 = "".join(comp[c] for c in frag[-300:])[::-1]
        # knock one mate's seeds out now and then so rescue fires
        if i % 5 == 0:
            r2 = "".join(str(rng.choice(list(B))) for _ in range(300))
        reads.append(Read(name=f"L{i}", comment=None, seq=r1,
                          qual="I" * 300))
        reads.append(Read(name=f"L{i}", comment=None, seq=r2,
                          qual="I" * 300))
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    out = {}
    for native in (False, True):
        rd = [Read(name=r.name, comment=None, seq=r.seq, qual=r.qual)
              for r in reads]
        be = DeviceBackend(fm, opt)
        Aligner(fm, opt, backend=be, verbose=0,
                native_rt=native).process(rd, 0)
        out[native] = "".join(r.sam for r in rd)
    assert out[True] == out[False]


def test_bsw_int16_guard_includes_h0(fm):
    # h0 beyond the int16 range must take the int32 DP path bit-exactly
    import numpy as np
    import jax.numpy as jnp
    from bwamem2_tpu.ops.bsw import bsw_kernel
    from bwamem2_tpu.native import bsw_extend
    rng = np.random.default_rng(5)
    P, Q, T = 8, 127, 96
    q = rng.integers(0, 4, (P, Q)).astype(np.int8)
    t = rng.integers(0, 4, (P, T)).astype(np.int8)
    qlen = np.full(P, Q, np.int32)
    tlen = np.full(P, T, np.int32)
    h0 = np.full(P, 34000, np.int32)
    w = np.full(P, 100, np.int32)
    opt = MemOptions().finalize()
    mat = np.array(opt.mat, np.int8)
    res = np.asarray(bsw_kernel(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(h0), jnp.asarray(w),
        1, 4, 6, 1, 6, 1, 100, 5, 1, 1 << 30))
    for i in range(P):
        want = bsw_extend(q[i], t[i], mat, 6, 1, 6, 1, 100, 5, 100, 34000)
        assert tuple(int(x) for x in res[i]) == tuple(want)
