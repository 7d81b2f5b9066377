"""Generate deterministic test data and golden outputs.

Data (committed): a synthetic two-contig genome with N runs, single-end and
paired-end read sets sampled with substitutions/indels.

Goldens (committed): index files + SAM produced by the *reference* bwa-mem2
binary, built out-of-tree in .refbuild/ (see .refbuild/build.sh).  Re-run this
script only when the fixtures need to change; tests consume the committed
copies.

Usage: python tests/make_fixtures.py [--with-ref]
"""

import os
import shutil
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")
FIX = os.path.join(HERE, "fixtures")
REPO = os.path.dirname(HERE)
REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")

BASES = np.array(list("ACGT"))


def wrap(seq: str, width: int = 70) -> str:
    return "\n".join(seq[i:i + width] for i in range(0, len(seq), width))


def make_genome(rng) -> dict:
    """Two contigs (~60kb + ~40kb) with GC skew and N runs."""
    contigs = {}
    c1 = rng.choice(BASES, size=60000, p=[0.3, 0.2, 0.2, 0.3]).tolist()
    # embed some repeats: copy a 800bp block to 3 places
    block = c1[10000:10800]
    c1[30000:30800] = block
    c1[45000:45800] = block
    # N runs
    for start, ln in [(5000, 50), (25000, 120), (59900, 30)]:
        for i in range(start, min(start + ln, len(c1))):
            c1[i] = "N"
    contigs["chrA"] = "".join(c1)
    c2 = rng.choice(BASES, size=40000, p=[0.25, 0.25, 0.25, 0.25]).tolist()
    c2[20000:20050] = ["N"] * 50
    contigs["chrB test contig"] = "".join(c2)
    return contigs


def mutate(read, rng, sub=0.01, ins=0.001, dele=0.001):
    out = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    for ch in read:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(str(rng.choice(BASES)))
        if r < dele + ins + sub:
            out.append(str(rng.choice([b for b in "ACGT" if b != ch])))
        else:
            out.append(ch)
    return "".join(out)


def revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def sample_se(contigs, rng, n=300, readlen=101):
    genome = "".join(contigs.values())
    reads = []
    for i in range(n):
        pos = int(rng.integers(0, len(genome) - readlen))
        seq = genome[pos:pos + readlen]
        if rng.random() < 0.5:
            seq = revcomp(seq)
        seq = mutate(seq, rng)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(25, 40, len(seq)))
        reads.append((f"se_{i}", seq, qual))
    return reads


def sample_pe(contigs, rng, n=400, readlen=150, isize_mu=400, isize_sd=40):
    genome = "".join(contigs.values())
    r1s, r2s = [], []
    for i in range(n):
        isize = max(int(rng.normal(isize_mu, isize_sd)), readlen + 10)
        pos = int(rng.integers(0, len(genome) - isize - 1))
        frag = genome[pos:pos + isize]
        r1 = frag[:readlen]
        r2 = revcomp(frag[-readlen:])
        if rng.random() < 0.5:
            r1, r2 = r2, r1  # swap which mate is forward
            # note: conventional FR pairs either way
        r1 = mutate(r1, rng)
        r2 = mutate(r2, rng)
        q1 = "".join(chr(33 + int(q)) for q in rng.integers(25, 40, len(r1)))
        q2 = "".join(chr(33 + int(q)) for q in rng.integers(25, 40, len(r2)))
        r1s.append((f"pe_{i}", r1, q1))
        r2s.append((f"pe_{i}", r2, q2))
    return r1s, r2s


def write_fastq(path, reads):
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def main():
    os.makedirs(DATA, exist_ok=True)
    os.makedirs(FIX, exist_ok=True)
    rng = np.random.default_rng(20260816)

    contigs = make_genome(rng)
    fa = os.path.join(DATA, "ref_small.fa")
    with open(fa, "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n{wrap(seq)}\n")

    write_fastq(os.path.join(DATA, "reads_se.fq"), sample_se(contigs, rng))
    r1, r2 = sample_pe(contigs, rng)
    write_fastq(os.path.join(DATA, "reads_r1.fq"), r1)
    write_fastq(os.path.join(DATA, "reads_r2.fq"), r2)

    # mixed SE/PE stream for smart pairing (-p): interleaved pairs with SE
    # reads woven in between pairs (bseq_classify input, bwa.cpp:226-242)
    def readfq(path):
        recs = []
        with open(path) as f:
            while True:
                h = f.readline()
                if not h:
                    break
                recs.append(h + f.readline() + f.readline() + f.readline())
        return recs

    m1 = readfq(os.path.join(DATA, "reads_r1.fq"))
    m2 = readfq(os.path.join(DATA, "reads_r2.fq"))
    ms = readfq(os.path.join(DATA, "reads_se.fq"))
    mixed, si = [], 0
    for i in range(60):
        if i % 3 == 0 and si < 30:
            mixed.append(ms[si])
            si += 1
        mixed.append(m1[i])
        mixed.append(m2[i])
    mixed.extend(ms[si:si + 5])
    with open(os.path.join(DATA, "reads_mixed.fq"), "w") as f:
        f.write("".join(mixed))

    # indel-heavy + repeat-adversarial SE set (always-on golden coverage)
    rng_h = np.random.default_rng(90210)
    g = "".join(contigs.values())[:60000]  # chrA
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    hard = []

    def emit(name, s):
        if rng_h.random() < 0.5:
            s = "".join(comp[c] for c in reversed(s))
        q = "".join(chr(33 + int(x))
                    for x in rng_h.integers(25, 40, len(s)))
        hard.append(f"@{name}\n{s}\n+\n{q}\n")

    for i in range(150):   # 2-8bp indel events
        p = int(rng_h.integers(0, len(g) - 200))
        s = list(g[p:p + 170])
        for _ in range(int(rng_h.integers(1, 3))):
            q = int(rng_h.integers(10, 150))
            ln = int(rng_h.integers(2, 9))
            if rng_h.random() < 0.5:
                del s[q:q + ln]
            else:
                s[q:q] = rng_h.choice(BASES, ln).tolist()
        s = "".join(s)[:150].replace("N", "A")
        for j in rng_h.integers(0, len(s), 2):
            s = s[:j] + str(rng_h.choice(BASES)) + s[j + 1:]
        emit(f"indel_{i}", s)
    for i in range(100):   # inside the triplicated 800bp block
        b = [10000, 30000, 45000][int(rng_h.integers(0, 3))]
        p = b + int(rng_h.integers(0, 700))
        emit(f"rep_{i}", g[p:p + 101])
    with open(os.path.join(DATA, "reads_hard.fq"), "w") as f:
        f.write("".join(hard))

    # pacbio/ont-style long reads (2-8kb, ~10% error) from chrA
    rng_p = np.random.default_rng(424242)
    gA = "".join(contigs.values())[:60000]
    pb = []
    for i in range(25):
        ln = int(rng_p.integers(2000, 8000))
        p0 = int(rng_p.integers(0, len(gA) - ln))
        src = list(gA[p0:p0 + ln].replace("N", "A"))
        out2, j = [], 0
        while j < len(src):
            r = rng_p.random()
            if r < 0.04:
                j += 1
                continue
            if r < 0.07:
                out2.append(str(rng_p.choice(BASES)))
                continue
            out2.append(str(rng_p.choice(BASES)) if r < 0.10 else src[j])
            j += 1
        seq = "".join(out2)
        if rng_p.random() < 0.5:
            seq = "".join(comp[c] for c in reversed(seq))
        q = "".join(chr(33 + int(x))
                    for x in rng_p.integers(10, 30, len(seq)))
        pb.append(f"@pb_{i}\n{seq}\n+\n{q}\n")
    with open(os.path.join(DATA, "reads_pacbio.fq"), "w") as f:
        f.write("".join(pb))

    # tiny genome for oracle unit tests
    tiny = "".join(rng.choice(BASES, size=3000).tolist())
    tiny = tiny[:1200] + "NNNNNNNN" + tiny[1200:]
    with open(os.path.join(DATA, "ref_tiny.fa"), "w") as f:
        f.write(f">tiny\n{wrap(tiny)}\n")

    if "--with-ref" in sys.argv:
        if not os.path.exists(REF_BIN):
            sys.exit(f"reference binary not found at {REF_BIN}")
        for base in ("ref_small.fa", "ref_tiny.fa"):
            src = os.path.join(DATA, base)
            pref = os.path.join(FIX, base)
            shutil.copy(src, pref)
            subprocess.run([REF_BIN, "index", pref], check=True,
                           capture_output=True)
            os.remove(pref)
        pref = os.path.join(FIX, "ref_small.fa")
        env = dict(os.environ)
        with open(os.path.join(FIX, "golden_se.sam"), "w") as out:
            subprocess.run(
                [REF_BIN, "mem", pref, os.path.join(DATA, "reads_se.fq")],
                check=True, stdout=out, stderr=subprocess.DEVNULL, env=env)
        with open(os.path.join(FIX, "golden_pe.sam"), "w") as out:
            subprocess.run(
                [REF_BIN, "mem", pref, os.path.join(DATA, "reads_r1.fq"),
                 os.path.join(DATA, "reads_r2.fq")],
                check=True, stdout=out, stderr=subprocess.DEVNULL, env=env)
        with open(os.path.join(FIX, "golden_se_hard.sam"), "w") as out:
            subprocess.run(
                [REF_BIN, "mem", pref, os.path.join(DATA, "reads_hard.fq")],
                check=True, stdout=out, stderr=subprocess.DEVNULL, env=env)
        for mode, gname in (("pacbio", "golden_pacbio.sam"),
                            ("ont2d", "golden_ont2d.sam")):
            with open(os.path.join(FIX, gname), "w") as out:
                subprocess.run(
                    [REF_BIN, "mem", "-x", mode, pref,
                     os.path.join(DATA, "reads_pacbio.fq")],
                    check=True, stdout=out, stderr=subprocess.DEVNULL,
                    env=env)
        with open(os.path.join(FIX, "golden_mixed_p.sam"), "w") as out:
            subprocess.run(
                [REF_BIN, "mem", "-p", pref,
                 os.path.join(DATA, "reads_mixed.fq")],
                check=True, stdout=out, stderr=subprocess.DEVNULL, env=env)
        print("golden SAM + index fixtures written to", FIX)


if __name__ == "__main__":
    main()
