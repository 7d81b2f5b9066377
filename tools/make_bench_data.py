"""Deterministic bench dataset generator (committed, reproducible).

Builds the round-2 bench config from nothing but this script + a seed:
  * a chr21-scale synthetic genome (default 46.7 Mbp, one contig, telomeric
    N runs, interspersed repeat families so seeding sees realistic
    multi-occurrence SMEMs),
  * our index over it (bwamem2_tpu index — byte-compatible with the
    reference's, FMI_search.cpp:144-304),
  * 2x150bp paired-end reads (insert ~420 +- 60, 0.5%% substitutions,
    0.05%% indels) — the BASELINE.md target shape,
  * optionally a single-end 101bp set (the round-1 shape, kept for
    comparison).

Everything lands under .tmp/bench_chr21/ and is cached by content-free
checks (file exists => reuse).  `--scale N` scales the genome (0.25 =>
11.7Mb quick config; 1.0 => 46.7Mb chr21 class).

Usage: python tools/make_bench_data.py [--scale 1.0] [--force]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65, 78: 78}
GENOME_LEN = 46_700_000
READ_LEN = 150
N_PAIRS = 10_000
INSERT_MEAN, INSERT_STD = 420.0, 60.0


def make_genome(path: str, scale: float, seed: int = 2024) -> None:
    """One contig; random core + repeat families + N runs.

    Repeat families emulate chr21's interspersed repeats: 300bp and 6kb
    blocks copied (with 2% divergence) to many locations — this is what
    exercises max_occ/chain filtering and the re-seeding rounds.
    """
    rng = np.random.default_rng(seed)
    n = int(GENOME_LEN * scale)
    g = BASES[rng.integers(0, 4, n)]
    # ALU-like family: 300bp consensus, ~n/3000 copies (1 per 3kb)
    alu = BASES[rng.integers(0, 4, 300)]
    for _ in range(n // 3000):
        p = int(rng.integers(0, n - 300))
        cp = alu.copy()
        div = rng.random(300) < 0.02
        cp[div] = BASES[rng.integers(0, 4, int(div.sum()))]
        g[p:p + 300] = cp
    # LINE-like family: 6kb consensus, 1 per 150kb
    line = BASES[rng.integers(0, 4, 6000)]
    for _ in range(n // 150_000):
        p = int(rng.integers(0, n - 6000))
        cp = line.copy()
        div = rng.random(6000) < 0.02
        cp[div] = BASES[rng.integers(0, 4, int(div.sum()))]
        g[p:p + 6000] = cp
    # telomere/centromere N runs
    g[:10_000] = ord("N")
    g[-10_000:] = ord("N")
    mid = n // 2
    g[mid:mid + 50_000] = ord("N")
    with open(path, "w") as f:
        f.write(">chr21s synthetic chr21-scale\n")
        s = g.tobytes().decode()
        for i in range(0, n, 80):
            f.write(s[i:i + 80])
            f.write("\n")


def sample_reads_pe(prefix: str, fq1: str, fq2: str, n_pairs: int,
                    seed: int = 7) -> None:
    """Sample proper FR pairs from the built index's packed genome."""
    from bwamem2_tpu.index.fmindex import FMIndex
    fm = FMIndex.load(prefix)
    g = fm.ref_string  # 2-bit codes, forward strand only, len l_pac
    rng = np.random.default_rng(seed)
    B = "ACGT"
    rc = {"A": "T", "C": "G", "G": "C", "T": "A"}
    lines1, lines2 = [], []
    npairs = 0
    while npairs < n_pairs:
        isize = int(rng.normal(INSERT_MEAN, INSERT_STD))
        if isize < READ_LEN + 10:
            continue
        p = int(rng.integers(0, fm.l_pac - isize))
        frag = g[p:p + isize]
        r1 = frag[:READ_LEN].copy()
        r2 = frag[-READ_LEN:][::-1].copy()  # reverse; complement via code
        seqs = []
        for ri, r in enumerate((r1, r2)):
            # 0.5% subs, 0.05% indels via code-space edits
            sub = rng.random(len(r)) < 0.005
            r[sub] = (r[sub] + rng.integers(1, 4, int(sub.sum()))) % 4
            s = "".join(B[c] for c in r)
            if ri == 1:
                s = "".join(rc[c] for c in s)
            if rng.random() < 0.05:  # one indel in 5% of reads
                q = int(rng.integers(10, len(s) - 10))
                if rng.random() < 0.5:
                    s = s[:q] + s[q + 1:] + B[int(rng.integers(0, 4))]
                else:
                    s = s[:q] + B[int(rng.integers(0, 4))] + s[q:-1]
            seqs.append(s)
        q = "I" * READ_LEN
        lines1.append(f"@p{npairs}/1\n{seqs[0]}\n+\n{q}\n")
        lines2.append(f"@p{npairs}/2\n{seqs[1]}\n+\n{q}\n")
        npairs += 1
    with open(fq1, "w") as f:
        f.write("".join(lines1))
    with open(fq2, "w") as f:
        f.write("".join(lines2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--pairs", type=int, default=N_PAIRS)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--fq-prefix", default="reads",
                    help="reads filename prefix ({prefix}_r1.fq) — lets "
                         "several read-set sizes share one genome/index")
    ap.add_argument("--dir", default=os.path.join(REPO, ".tmp",
                                                  "bench_chr21"))
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)
    fa = os.path.join(args.dir, "genome.fa")
    if args.force or not os.path.exists(fa):
        print(f"[bench-data] generating genome ({args.scale:.2f}x chr21)",
              file=sys.stderr)
        make_genome(fa, args.scale)
    if args.force or not os.path.exists(fa + ".bwt.2bit.64"):
        print("[bench-data] building index", file=sys.stderr)
        from bwamem2_tpu.index.build import build_index
        build_index(fa, fa)
    fq1 = os.path.join(args.dir, f"{args.fq_prefix}_r1.fq")
    fq2 = os.path.join(args.dir, f"{args.fq_prefix}_r2.fq")
    if args.force or not os.path.exists(fq1):
        print(f"[bench-data] sampling {args.pairs} 2x{READ_LEN}bp pairs",
              file=sys.stderr)
        sample_reads_pe(fa, fq1, fq2, args.pairs)
    print(args.dir)


if __name__ == "__main__":
    main()
