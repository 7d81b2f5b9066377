"""Differential fuzz vs the reference binary (auto-skips without .refbuild).

Adversarial corpus on a genome with tiny contigs, N runs, and repeats:
reads straddling contig starts/ends, N-dense reads, homopolymers, very
short reads — SE and PE outputs must be bit-identical to bwa-mem2.
"""

import os
import subprocess

import numpy as np
import pytest

from conftest import FIXTURES, REPO

REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
WORK = os.path.join(REPO, ".tmp", "fuzz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN),
    reason="reference binary not built (tools/build_reference.sh)")


@pytest.fixture(scope="module")
def corpus():
    os.makedirs(WORK, exist_ok=True)
    rng = np.random.default_rng(1234)
    bases = "ACGT"
    fa = os.path.join(WORK, "g.fa")
    contigs = []
    for i, ln in enumerate((50_000, 3_000, 211, 77, 20_000)):
        g = "".join(bases[c] for c in rng.integers(0, 4, ln))
        if ln > 1000:  # N runs + a repeat family
            g = g[:500] + "N" * 37 + g[537:]
            g = g[: ln // 2] + g[100:400] + g[ln // 2 + 300:]
        contigs.append((f"ctg{i}", g))
    with open(fa, "w") as f:
        for name, g in contigs:
            f.write(f">{name}\n")
            for j in range(0, len(g), 70):
                f.write(g[j:j + 70] + "\n")

    # index with BOTH tools; reuse ours (byte-identical is covered elsewhere)
    subprocess.run([REF_BIN, "index", fa], check=True,
                   capture_output=True)

    def mutate(s, k):
        s = list(s)
        for p in rng.integers(0, len(s), k):
            s[p] = bases[int(rng.integers(0, 4))]
        return "".join(s)

    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    genome = "".join(g for _, g in contigs)
    reads = []
    for i in range(150):
        ln = int(rng.integers(25, 150))
        p = int(rng.integers(0, len(genome) - ln))
        s = mutate(genome[p:p + ln], int(rng.integers(0, 4)))
        if rng.random() < 0.5:
            s = "".join(comp[c] for c in reversed(s))
        reads.append(s)
    # adversarial extras
    reads.append("A" * 80)                        # homopolymer
    reads.append("ACGT" * 25)                     # low-complexity repeat
    reads.append(("N" * 10).join(["ACGTACGTACGTACGTACGT"] * 3))  # N-dense
    reads.append(contigs[3][1])                   # an entire 77bp contig
    reads.append(contigs[0][1][:30])              # contig start
    reads.append(contigs[0][1][-30:])             # contig end
    se = os.path.join(WORK, "se.fq")
    with open(se, "w") as f:
        for i, s in enumerate(reads):
            f.write(f"@f{i}\n{s}\n+\n{'I' * len(s)}\n")
    return fa, se


def _run_ours(args):
    from bwamem2_tpu.cli import main
    import io, sys
    out = os.path.join(WORK, "ours.sam")
    rc = main(["mem", "-o", out] + args)
    assert rc == 0
    with open(out) as f:
        return [l for l in f if not l.startswith("@PG")]


def _run_ref(args):
    r = subprocess.run([REF_BIN, "mem"] + args, check=True,
                       capture_output=True, text=True)
    return [l for l in r.stdout.splitlines(keepends=True)
            if not l.startswith("@PG")]


def test_fuzz_se_bit_identical(corpus):
    fa, se = corpus
    assert _run_ours([fa, se]) == _run_ref([fa, se])


def test_fuzz_se_all_alignments(corpus):
    fa, se = corpus
    args = ["-a", "-T", "20", fa, se]
    assert _run_ours(args) == _run_ref(args)


def test_fuzz_pe_bit_identical(corpus):
    fa, _ = corpus
    rng = np.random.default_rng(77)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    genome = "".join(l.strip() for l in open(fa) if not l.startswith(">"))
    bases = "ACGT"
    p1 = os.path.join(WORK, "r1.fq")
    p2 = os.path.join(WORK, "r2.fq")
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i in range(120):
            ins = int(rng.integers(150, 420))
            p = int(rng.integers(0, len(genome) - ins - 1))
            a = list(genome[p:p + 80])
            b = list(genome[p + ins - 80:p + ins])
            for q in rng.integers(0, 80, 2):
                a[q] = bases[int(rng.integers(0, 4))]
            for q in rng.integers(0, 80, 2):
                b[q] = bases[int(rng.integers(0, 4))]
            a = "".join(a)
            b = "".join(comp[c] for c in reversed("".join(b)))
            f1.write(f"@p{i}\n{a}\n+\n{'I' * 80}\n")
            f2.write(f"@p{i}\n{b}\n+\n{'I' * 80}\n")
    args = [fa, p1, p2]
    assert _run_ours(args) == _run_ref(args)
