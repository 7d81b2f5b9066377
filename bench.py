"""Benchmark: end-to-end PE alignment throughput on one TPU chip.

Round-2 config (BASELINE.md target shape): chr21-scale synthetic genome
(46.7 Mbp, repeat families, N runs) with 10,000 2x150bp read pairs —
regenerated deterministically by tools/make_bench_data.py if absent, so the
config is reproducible from the repo alone.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": R, ...}

baseline = reference bwa-mem2 v2.2.1 measured on this host's CPU with 1
thread on the same dataset (this box has a single core; the published
per-socket numbers use 56 threads — the long-term bar is vs_baseline >= 56).
If the gitignored reference build is present it is re-measured live;
otherwise the stored measurement is used.

Extra fields: host_cpu_s (process CPU over the timed pass: Python + native
runtime), wall_s, device_wait_frac (1 - cpu/wall on this 1-core host ~=
fraction of the pass spent waiting on the tunneled TPU), reads.
"""

import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, ".tmp", "bench_chr21")
PREFIX = os.path.join(BENCH_DIR, "genome.fa")
FQ1 = os.path.join(BENCH_DIR, "reads_r1.fq")
FQ2 = os.path.join(BENCH_DIR, "reads_r2.fq")
REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
# measured on this host (1 core, Cooper Lake vCPU), 2026-08-16: 20k reads
# PE 2x150 chr21-scale, `bwa-mem2.ref mem -t 1`
FALLBACK_BASELINE_RPS = 3175.0
N_READS = 20000
TASK_BASES = 750_000   # 5k reads per chunk; 4 chunks round-robin


def ensure_data():
    if not (os.path.exists(PREFIX + ".bwt.2bit.64") and os.path.exists(FQ1)):
        print("[bench] generating chr21-scale dataset (one-time, ~5 min)",
              file=sys.stderr)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_bench_data.py")],
                       check=True)


def measure_baseline():
    if not os.path.exists(REF_BIN):
        return FALLBACK_BASELINE_RPS, "stored"
    t0 = time.time()
    subprocess.run([REF_BIN, "mem", "-t", "1", PREFIX, FQ1, FQ2],
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   check=True)
    return N_READS / (time.time() - t0), "measured"


def main():
    ensure_data()

    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MEM_F_PE, MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline

    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    backend = DeviceBackend(fm, opt, index_prefix=PREFIX)
    al = Aligner(fm, opt, backend=backend, verbose=0)
    devnull = open(os.devnull, "w")

    def one_pass():
        ks1 = FastxReader(FQ1)
        ks2 = FastxReader(FQ2)
        ru0 = resource.getrusage(resource.RUSAGE_SELF)
        t0 = time.time()
        n = run_pipeline(al, ks1, ks2, TASK_BASES, devnull, verbose=0,
                         n_workers=4)
        wall = time.time() - t0
        ru1 = resource.getrusage(resource.RUSAGE_SELF)
        cpu = (ru1.ru_utime - ru0.ru_utime) + (ru1.ru_stime - ru0.ru_stime)
        assert n == N_READS
        return wall, cpu

    one_pass()                    # warm: compile/load all shape buckets
    # median of 3 timed passes: the tunneled-TPU link's throughput varies
    # several-fold between runs, and the median is the honest steady state
    runs = sorted(one_pass() for _ in range(3))
    wall, cpu = runs[1]
    ours = N_READS / wall
    print(f"[bench] ours: {ours:.0f} reads/s e2e ({wall:.2f}s, {N_READS} "
          f"2x150bp PE reads, chr21-scale, 1 chip; host cpu {cpu:.1f}s, "
          f"device-wait {100 * (1 - cpu / wall):.0f}%)", file=sys.stderr)

    base, how = measure_baseline()
    print(f"[bench] baseline (reference, 1 CPU thread, {how}): "
          f"{base:.0f} reads/s", file=sys.stderr)

    print(json.dumps({
        "metric": "pe_2x150_chr21scale_reads_per_sec_1chip_e2e",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / base, 4),
        "baseline_1thread_rps": round(base, 1),
        "wall_s": round(wall, 2),
        "host_cpu_s": round(cpu, 2),
        "device_wait_frac": round(1 - cpu / wall, 3),
        "reads": N_READS,
    }))


if __name__ == "__main__":
    main()
