"""Flag-matrix golden tests: every supported `mem` option must reproduce the
reference binary's SAM bit-for-bit (fixtures generated from bwa-mem2 v2.2.1
with the same flags)."""

import os

import pytest

from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.cli import parse_mem_args
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MEM_F_PE

from conftest import DATA, FIXTURES

PREFIX = os.path.join(FIXTURES, "ref_small.fa")

SE_CASES = [
    ("-a", "golden_se_a.sam"),
    ("-Y", "golden_se_Y.sam"),
    ("-5", "golden_se_5.sam"),
    ("-T20", "golden_se_T20.sam"),
    ("-h10", "golden_se_h10.sam"),
    ("-L3,7", "golden_se_L3_7.sam"),
    ("-O5,4 -E2,1", "golden_se_O5_4E2_1.sam"),
    ("-B2", "golden_se_B2.sam"),
    ("-k15", "golden_se_k15.sam"),
    ("-r1.2", "golden_se_r1_2.sam"),
    ("-c100", "golden_se_c100.sam"),
    ("-D0.3", "golden_se_D0_3.sam"),
    pytest.param(
        "-A2", "golden_se_A2.sam",
        marks=pytest.mark.xfail(
            strict=True,
            reason="KNOWN REFERENCE DEVIATION: bwa-mem2's vectorized 8-bit "
                   "extension kernel returns different scores than its own "
                   "scalar kernel (== ksw_extend2 == bwa-mem 0.7.17) when "
                   "-A>1 scales scores near the int8 range; verified with "
                   "a standalone driver (scalar: score 96 qle 15, vec8: "
                   "score 80 qle 0 on the same pair).  We follow the scalar "
                   "semantics, i.e. bwa-mem 0.7.17 behavior.")),
    ("-y10", "golden_se_y10.sam"),
    ("-s5", "golden_se_s5.sam"),
]

PE_CASES = [
    ("-S", "golden_pe_S.sam"),
    ("-P", "golden_pe_P.sam"),
    ("-I400,50", "golden_pe_I400_50.sam"),
]


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(PREFIX)


def run_case(fm, flags: str, paired: bool):
    argv = flags.split() + [PREFIX]
    parsed = parse_mem_args(argv[:-1] + [PREFIX, "x"])
    opt, mode, pes0 = parsed[0], parsed[1], parsed[9]
    opt.finalize(mode)
    if paired:
        opt.flag |= MEM_F_PE
        reads = read_chunk(FastxReader(os.path.join(DATA, "reads_r1.fq")),
                           FastxReader(os.path.join(DATA, "reads_r2.fq")),
                           10**9)
    else:
        reads = read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                           None, 10**9)
    Aligner(fm, opt, verbose=0).process(reads, 0, pes0=pes0)
    return "".join(r.sam for r in reads).splitlines(keepends=True)


@pytest.mark.parametrize("flags,golden", SE_CASES)
def test_se_flag_golden(fm, flags, golden):
    ours = run_case(fm, flags, paired=False)
    with open(os.path.join(FIXTURES, golden)) as f:
        want = f.readlines()
    assert ours == want


@pytest.mark.parametrize("flags,golden", PE_CASES,
                         ids=[c[0] for c in PE_CASES])
def test_pe_flag_golden(fm, flags, golden):
    ours = run_case(fm, flags, paired=True)
    with open(os.path.join(FIXTURES, golden)) as f:
        want = f.readlines()
    assert ours == want
