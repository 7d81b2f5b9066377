"""Benchmark: end-to-end alignment throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": R}

baseline = reference bwa-mem2 v2.2.1 measured on this host's CPU with 1
thread on the same dataset (the box has a single core; the published
per-socket numbers use 56 threads).  If the gitignored reference build is
present it is re-measured live; otherwise the stored measurement is used.

Dataset: 5000 synthetic 101bp SE reads sampled (with 2 mutations each) from
the committed 100kb two-contig fixture genome — deterministic, seed 42.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PREFIX = os.path.join(REPO, "tests", "fixtures", "ref_small.fa")
REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
TMP = os.path.join(REPO, ".tmp")
BENCH_FQ = os.path.join(TMP, "bench_se.fq")
# measured on this host (1 core, Cooper Lake vCPU), 2026-08-16:
FALLBACK_BASELINE_RPS = 4366.0

N_READS = 5000
READ_LEN = 101


def make_reads(fm):
    rng = np.random.default_rng(42)
    B = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    g = fm.ref_string
    lines = []
    for i in range(N_READS):
        p = int(rng.integers(0, fm.l_pac - READ_LEN))
        s = g[p:p + READ_LEN].copy()
        mut = rng.integers(0, READ_LEN, 2)
        s[mut] = (s[mut] + rng.integers(1, 4, 2)) % 4
        seq = "".join(B[c] for c in s)
        if rng.random() < 0.5:
            seq = "".join(comp[c] for c in reversed(seq))
        lines.append(f"@b{i}\n{seq}\n+\n{'I' * READ_LEN}\n")
    os.makedirs(TMP, exist_ok=True)
    with open(BENCH_FQ, "w") as f:
        f.write("".join(lines))


def measure_baseline():
    if not os.path.exists(REF_BIN):
        return FALLBACK_BASELINE_RPS, "stored"
    t0 = time.time()
    subprocess.run([REF_BIN, "mem", "-t", "1", PREFIX, BENCH_FQ],
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   check=True)
    return N_READS / (time.time() - t0), "measured"


def main():
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend

    fm = FMIndex.load(PREFIX)
    if not os.path.exists(BENCH_FQ):
        make_reads(fm)

    opt = MemOptions().finalize()
    backend = DeviceBackend(fm, opt)
    al = Aligner(fm, opt, backend=backend, verbose=0)

    # production path: ordered chunk pipeline, 4 compute workers (host
    # python of one chunk overlaps device waits of the others)
    from bwamem2_tpu.runtime import run_pipeline
    task = (N_READS * READ_LEN) // 4
    devnull = open(os.devnull, "w")

    def one_pass():
        ks = FastxReader(BENCH_FQ)
        t0 = time.time()
        n = run_pipeline(al, ks, None, task, devnull, verbose=0,
                         n_workers=4)
        assert n == N_READS
        return time.time() - t0

    one_pass()                    # warm: compile all shape buckets
    # median of 3 timed passes: the tunneled-TPU link's throughput varies
    # several-fold between runs, and the median is the honest steady state
    dt = sorted(one_pass() for _ in range(3))[1]
    ours = N_READS / dt
    print(f"[bench] ours: {ours:.0f} reads/s e2e "
          f"({dt:.2f}s, {N_READS} reads, 1 chip)", file=sys.stderr)

    base, how = measure_baseline()
    print(f"[bench] baseline (reference, 1 CPU thread, {how}): "
          f"{base:.0f} reads/s", file=sys.stderr)

    print(json.dumps({
        "metric": "se_101bp_reads_per_sec_1chip_e2e",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / base, 4),
    }))


if __name__ == "__main__":
    main()
