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
