"""Golden tests for ALT-contig handling, comments, read groups, XR, -M."""

import os

import pytest

from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MEM_F_NO_MULTI, MEM_F_REF_HDR, MemOptions

from conftest import DATA, FIXTURES


def golden(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return f.readlines()


def run(prefix, fq, opt, rg_id=None, ignore_alt=False, copy_comment=False):
    fm = FMIndex.load(prefix)
    if ignore_alt:
        for a in fm.bns.anns:
            a.is_alt = False
    reads = read_chunk(FastxReader(fq), None, 10**9)
    if not copy_comment:
        for r in reads:
            r.comment = None
    Aligner(fm, opt, rg_id=rg_id, verbose=0).process(reads, 0)
    return "".join(r.sam for r in reads).splitlines(keepends=True)


def test_alt_contig_golden():
    """chrB flagged ALT via .alt: primary selection / XA / flags change."""
    ours = run(os.path.join(FIXTURES, "alt", "ref_small.fa"),
               os.path.join(DATA, "reads_se.fq"), MemOptions().finalize())
    assert ours == golden("golden_se_alt.sam")


def test_alt_ignored_with_j():
    ours = run(os.path.join(FIXTURES, "alt", "ref_small.fa"),
               os.path.join(DATA, "reads_se.fq"), MemOptions().finalize(),
               ignore_alt=True)
    assert ours == golden("golden_se_alt_j.sam")


def test_comment_passthrough_C():
    ours = run(os.path.join(FIXTURES, "ref_small.fa"),
               os.path.join(DATA, "reads_se_comment.fq"),
               MemOptions().finalize(), copy_comment=True)
    assert ours == golden("golden_se_C.sam")


def test_xr_tag_V():
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_REF_HDR
    ours = run(os.path.join(FIXTURES, "ref_small.fa"),
               os.path.join(DATA, "reads_se.fq"), opt)
    assert ours == golden("golden_se_V.sam")


def test_read_group_R():
    ours = run(os.path.join(FIXTURES, "ref_small.fa"),
               os.path.join(DATA, "reads_se.fq"), MemOptions().finalize(),
               rg_id="rg1")
    assert ours == golden("golden_se_R.sam")


def test_mark_secondary_M():
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_NO_MULTI
    ours = run(os.path.join(FIXTURES, "ref_small.fa"),
               os.path.join(DATA, "reads_se.fq"), opt)
    assert ours == golden("golden_se_M.sam")
