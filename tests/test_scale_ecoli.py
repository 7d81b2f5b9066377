"""E. coli-scale differential test (BASELINE config 1/2 scale).

Builds a synthetic 4.6 Mb genome, indexes it with BOTH toolchains (byte
compare), and maps SE + PE read sets with both (SAM compare).  Opt-in —
needs the gitignored reference build and a few minutes:

    BWAMEM2_TPU_SLOW_TESTS=1 python -m pytest tests/test_scale_ecoli.py -q
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from conftest import REPO

REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
WORK = os.path.join(REPO, ".tmp", "ecoli_scale")

pytestmark = pytest.mark.skipif(
    not (os.environ.get("BWAMEM2_TPU_SLOW_TESTS") and os.path.exists(REF_BIN)),
    reason="slow scale test (set BWAMEM2_TPU_SLOW_TESTS=1, needs .refbuild)")


@pytest.fixture(scope="module")
def workdir():
    os.makedirs(WORK, exist_ok=True)
    fa = os.path.join(WORK, "genome.fa")
    if not os.path.exists(fa):
        rng = np.random.default_rng(4600)
        bases = np.array(list("ACGT"))
        chunks = [">ecoli_syn"]
        g = rng.choice(bases, size=4_600_000,
                       p=[0.246, 0.254, 0.254, 0.246]).tolist()
        # a few repeat families + N runs
        block = g[100000:102000]
        for at in (1_200_000, 2_400_000, 3_600_000):
            g[at:at + 2000] = block
        for at, ln in ((500_000, 300), (3_000_000, 150)):
            g[at:at + ln] = ["N"] * ln
        seq = "".join(g)
        chunks.extend(seq[i:i + 80] for i in range(0, len(seq), 80))
        with open(fa, "w") as f:
            f.write("\n".join(chunks) + "\n")
    return WORK


def make_reads(workdir, n=1500, readlen=101, paired=False):
    rng = np.random.default_rng(7 + paired)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    with open(os.path.join(workdir, "genome.fa")) as f:
        genome = "".join(l.strip() for l in f if not l.startswith(">"))
    bases = np.array(list("ACGT"))

    def mutate(s):
        s = list(s)
        for p in rng.integers(0, len(s), 2):
            s[p] = str(rng.choice(bases))
        return "".join(s)

    if not paired:
        path = os.path.join(workdir, "se.fq")
        with open(path, "w") as f:
            for i in range(n):
                p = int(rng.integers(0, len(genome) - readlen))
                s = genome[p:p + readlen]
                if rng.random() < 0.5:
                    s = "".join(comp[c] for c in reversed(s))
                f.write(f"@e{i}\n{mutate(s)}\n+\n{'I' * readlen}\n")
        return path, None
    p1, p2 = (os.path.join(workdir, "r1.fq"), os.path.join(workdir, "r2.fq"))
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(n):
            isz = max(int(rng.normal(350, 35)), 160)
            p = int(rng.integers(0, len(genome) - isz - 1))
            frag = genome[p:p + isz]
            r1 = frag[:150]
            r2 = "".join(comp[c] for c in reversed(frag[-150:]))
            f1.write(f"@p{i}\n{mutate(r1)}\n+\n{'I' * 150}\n")
            f2.write(f"@p{i}\n{mutate(r2)}\n+\n{'I' * 150}\n")
    return p1, p2


@pytest.fixture(scope="module")
def indexes(workdir):
    fa = os.path.join(workdir, "genome.fa")
    ref_prefix = os.path.join(workdir, "ref_idx.fa")
    our_prefix = os.path.join(workdir, "our_idx.fa")
    if not os.path.exists(ref_prefix + ".bwt.2bit.64"):
        shutil.copy(fa, ref_prefix)
        subprocess.run([REF_BIN, "index", ref_prefix], check=True,
                       capture_output=True)
    if not os.path.exists(our_prefix + ".bwt.2bit.64"):
        from bwamem2_tpu.index.build import build_index
        shutil.copy(fa, our_prefix)
        build_index(our_prefix, verbose=False)
    return ref_prefix, our_prefix


@pytest.mark.parametrize("suffix", [".pac", ".ann", ".amb", ".0123",
                                    ".bwt.2bit.64"])
def test_index_byte_identical_at_scale(indexes, suffix):
    import filecmp
    ref_prefix, our_prefix = indexes
    assert filecmp.cmp(ref_prefix + suffix, our_prefix + suffix,
                       shallow=False), suffix


def run_ref(prefix, fq1, fq2=None):
    cmd = [REF_BIN, "mem", "-t", "1", prefix, fq1] + ([fq2] if fq2 else [])
    out = subprocess.run(cmd, check=True, capture_output=True, text=True)
    return [l for l in out.stdout.splitlines(keepends=True)
            if not l.startswith("@")]


def run_ours(prefix, fq1, fq2=None):
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MEM_F_PE, MemOptions
    fm = FMIndex.load(prefix)
    opt = MemOptions().finalize()
    ks2 = None
    if fq2:
        opt.flag |= MEM_F_PE
        ks2 = FastxReader(fq2)
    reads = read_chunk(FastxReader(fq1), ks2, 10**10)
    Aligner(fm, opt, verbose=0).process(reads, 0)
    return "".join(r.sam for r in reads).splitlines(keepends=True)


def test_se_sam_identical_at_scale(workdir, indexes):
    ref_prefix, our_prefix = indexes
    fq, _ = make_reads(workdir, paired=False)
    want = run_ref(ref_prefix, fq)
    got = run_ours(our_prefix, fq)
    assert len(got) == len(want)
    assert got == want


def test_pe_sam_identical_at_scale(workdir, indexes):
    ref_prefix, our_prefix = indexes
    fq1, fq2 = make_reads(workdir, paired=True)
    want = run_ref(ref_prefix, fq1, fq2)
    got = run_ours(our_prefix, fq1, fq2)
    assert len(got) == len(want)
    assert got == want
