"""End-to-end golden tests: SAM output must be bit-identical to the
reference bwa-mem2 binary's output on the committed fixtures."""

import os

import pytest

from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MEM_F_PE, MemOptions

from conftest import DATA, FIXTURES

PREFIX = os.path.join(FIXTURES, "ref_small.fa")


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(PREFIX)


def golden_lines(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return [l for l in f if not l.startswith("@")]


def test_single_end_bit_identical(fm):
    opt = MemOptions().finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                       None, 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = golden_lines("golden_se.sam")
    assert len(ours) == len(golden)
    assert ours == golden


def test_paired_end_bit_identical(fm):
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_r1.fq")),
                       FastxReader(os.path.join(DATA, "reads_r2.fq")), 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = golden_lines("golden_pe.sam")
    assert len(ours) == len(golden)
    assert ours == golden


def test_smart_pairing_mixed_stream(fm):
    # -p on a mixed SE/PE stream: bseq_classify splits the chunk
    # (bwa.cpp:226-242, fastmap.cpp:249-287)
    from bwamem2_tpu.options import MEM_F_SMARTPE
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE | MEM_F_SMARTPE
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_mixed.fq")),
                       None, 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = golden_lines("golden_mixed_p.sam")
    assert ours == golden


def test_indel_and_repeat_adversarial_golden(fm):
    # indel-heavy (2-8bp events) + repeat-block reads at default flags
    opt = MemOptions().finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_hard.fq")),
                       None, 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = golden_lines("golden_se_hard.sam")
    assert ours == golden


def test_pacbio_preset_long_reads(fm):
    # -x pacbio: 2-8kb reads at ~10% error through the long-read path
    # (native whole-read seeding + scalar-tail extension)
    opt = MemOptions().finalize("pacbio")
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_pacbio.fq")),
                       None, 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = golden_lines("golden_pacbio.sam")
    assert ours == golden


def test_ont2d_preset_long_reads(fm):
    opt = MemOptions().finalize("ont2d")
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_pacbio.fq")),
                       None, 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = golden_lines("golden_ont2d.sam")
    assert ours == golden
