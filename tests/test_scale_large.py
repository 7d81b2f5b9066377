"""Large-genome differential tests (BASELINE configs 3-4 territory).

Two opt-in tiers (both need the gitignored reference build):

  * 240 Mbp (chr1-class, BWAMEM2_TPU_SLOW_TESTS=1): index with both
    toolchains (byte compare), map a 2x150bp PE set with both (SAM compare).
    ~15 min on first run; artifacts cached under .tmp/bench_240m.

  * 1.2 Gbp (int64 tier, BWAMEM2_TPU_HUGE_TESTS=1): the doubled suffix
    space is 2.4G > 2^31, exercising the >32-bit coordinate paths
    everywhere (device kernels run the int64/occ4-only configuration,
    occ1 and int32 intervals are gated off).  ~1-2 h + ~40 GB RAM on
    first run; artifacts cached under .tmp/huge_1g2.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REPO

REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
GEN = os.path.join(REPO, "tools", "make_bench_data.py")


def _build_both(work: str, scale: float, pairs: int):
    """Our dataset+index via make_bench_data, reference index beside it."""
    subprocess.run([sys.executable, GEN, "--dir", work, "--scale",
                    str(scale), "--pairs", str(pairs)], check=True)
    fa = os.path.join(work, "genome.fa")
    ref_pref = os.path.join(work, "ref.genome.fa")
    if not os.path.exists(ref_pref + ".bwt.2bit.64"):
        subprocess.run([REF_BIN, "index", "-p", ref_pref, fa], check=True,
                       stderr=subprocess.DEVNULL)
    return fa, ref_pref


def _diff_indexes(ours: str, theirs: str):
    import filecmp
    for ext in (".0123", ".bwt.2bit.64", ".pac", ".amb"):
        assert filecmp.cmp(ours + ext, theirs + ext, shallow=False), ext


def _map_both(work: str, ours_pref: str, ref_pref: str):
    fq1 = os.path.join(work, "reads_r1.fq")
    fq2 = os.path.join(work, "reads_r2.fq")
    ref_sam = os.path.join(work, "ref.sam")
    our_sam = os.path.join(work, "ours.sam")
    with open(ref_sam, "w") as f:
        subprocess.run([REF_BIN, "mem", "-t", "1", ref_pref, fq1, fq2],
                       check=True, stdout=f, stderr=subprocess.DEVNULL)
    # single explicit backend (the CLI would replicate the index over all 8
    # virtual CPU devices of the test harness)
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MEM_F_PE, MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline

    fm = FMIndex.load(ours_pref)
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    be = DeviceBackend(fm, opt, index_prefix=ours_pref)
    al = Aligner(fm, opt, backend=be, verbose=0)
    with open(our_sam, "w") as f:
        n = run_pipeline(al, FastxReader(fq1), FastxReader(fq2),
                         opt.chunk_size, f, verbose=0, n_workers=2)
    assert n > 0

    def body(path):
        with open(path) as f:
            return [l for l in f if not l.startswith("@")]

    ours_lines = body(our_sam)
    ref_lines = body(ref_sam)
    assert len(ours_lines) == len(ref_lines)
    assert ours_lines == ref_lines


@pytest.mark.skipif(
    not (os.environ.get("BWAMEM2_TPU_SLOW_TESTS")
         and os.path.exists(REF_BIN)),
    reason="240Mbp scale test (set BWAMEM2_TPU_SLOW_TESTS=1, needs .refbuild)")
def test_240mbp_differential():
    work = os.path.join(REPO, ".tmp", "bench_240m")
    fa, ref_pref = _build_both(work, 5.14, 2000)
    _diff_indexes(fa, ref_pref)
    _map_both(work, fa, ref_pref)


@pytest.mark.skipif(
    not (os.environ.get("BWAMEM2_TPU_HUGE_TESTS")
         and os.path.exists(REF_BIN)),
    reason="1.2Gbp int64 tier (set BWAMEM2_TPU_HUGE_TESTS=1, needs .refbuild)")
def test_1g2_int64_differential():
    work = os.path.join(REPO, ".tmp", "huge_1g2")
    fa, ref_pref = _build_both(work, 25.7, 2000)   # 1.2 Gbp
    from bwamem2_tpu.index.io import read_ann_amb
    bns = read_ann_amb(fa)
    assert 2 * bns.l_pac > 2**31, "config must exercise >32-bit coordinates"
    _diff_indexes(fa, ref_pref)
    _map_both(work, fa, ref_pref)


@pytest.mark.skipif(
    not (os.environ.get("BWAMEM2_TPU_HUMAN_TESTS")
         and os.path.exists(REF_BIN)),
    reason="3.1Gbp GRCh38-class tier (set BWAMEM2_TPU_HUMAN_TESTS=1, needs "
           ".refbuild; ~5h + ~90GB RAM on first run)")
def test_3g1_human_scale_differential():
    """GRCh38-class differential: 3.1Gbp genome, byte-identical index files
    both directions and bit-identical SAM on 10k 2x150bp PE reads vs the
    reference binary (the scale of its ~88-billion-read validation,
    NEWS.md:10).  Both index builds and the reference mem run are hours on
    one core; artifacts cache under .tmp/human_3g1 (tools/human_diff.sh
    drives the same steps incrementally with per-stage logs)."""
    work = os.path.join(REPO, ".tmp", "human_3g1")
    fa, ref_pref = _build_both(work, 66.4, 5000)   # 3.10 Gbp
    from bwamem2_tpu.index.io import read_ann_amb
    bns = read_ann_amb(fa)
    assert bns.l_pac > 3_000_000_000, "config must be GRCh38-scale"
    _diff_indexes(fa, ref_pref)
    _map_both(work, fa, ref_pref)
