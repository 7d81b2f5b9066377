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
FQ1 = os.path.join(BENCH_DIR, "reads100k_r1.fq")
FQ2 = os.path.join(BENCH_DIR, "reads100k_r2.fq")
REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
# measured on this host (1 core, Cooper Lake vCPU), 2026-08-16: 20k reads
# PE 2x150 chr21-scale, `bwa-mem2.ref mem -t 1`
FALLBACK_BASELINE_RPS = 3175.0
# r5: 100k reads per VERDICT item 5 (steady state: fixed pipeline
# fill/drain and first-chunk costs < 5% of the run)
N_READS = 100000
# 15k reads per chunk: fills the N=16384 read-grid bucket, deep enough
# that per-op dispatch overheads amortize (the reference's analog knob is
# chunk_size*n_threads, fastmap.cpp:943-949)
TASK_BASES = 2_250_000
# the published per-socket reference config is 56 threads (README.md:120)
SOCKET_THREADS = 56


def ensure_data():
    if not (os.path.exists(PREFIX + ".bwt.2bit.64") and os.path.exists(FQ1)):
        print("[bench] generating chr21-scale dataset (one-time, ~6 min)",
              file=sys.stderr)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_bench_data.py")],
                       check=True)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_bench_data.py"),
                        "--pairs", "50000", "--fq-prefix", "reads100k"],
                       check=True)


def _ref_rps(prefix, fq1, fq2, n_reads, reps=2):
    """Best-of-N reference timing: this vCPU's throughput swings ~2x with
    neighbor load, and the FASTEST observed run is the least-contended
    (most favorable to the baseline, most honest for vs_baseline)."""
    best = None
    for _ in range(reps):
        t0 = time.time()
        subprocess.run([REF_BIN, "mem", "-t", "1", prefix, fq1, fq2],
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       check=True)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return n_reads / best


def measure_baseline():
    if not os.path.exists(REF_BIN):
        return FALLBACK_BASELINE_RPS, "stored"
    return _ref_rps(PREFIX, FQ1, FQ2, N_READS), "measured"


# ---------------------------------------------------------------------------
# 240 Mbp scale config (chr1-class): the r3 verdict's genome-size-cliff
# check.  Same 2x150bp PE shape, 5.14x the genome.  Generated (+ indexed)
# on demand ~12 min one-time; skipped only if generation fails.
# ---------------------------------------------------------------------------
DIR_240M = os.path.join(REPO, ".tmp", "bench_240m")
PREFIX_240M = os.path.join(DIR_240M, "genome.fa")
# reference 1-thread e2e on this host at 240Mbp, 2026-08-20 (11.3s wall for
# 20k reads, ~4.5s of it loading the 1.1GB index from disk)
FALLBACK_BASELINE_240M_RPS = 1763.0


def bench_240m(make_aligner):
    """Returns extra JSON fields for the 240Mbp config (or {} if data
    can't be built).  make_aligner(prefix) -> (aligner, opt)."""
    fq1 = os.path.join(DIR_240M, "reads_r1.fq")
    fq2 = os.path.join(DIR_240M, "reads_r2.fq")
    if not (os.path.exists(PREFIX_240M + ".bwt.2bit.64")
            and os.path.exists(fq1)):
        print("[bench] generating 240Mbp dataset (one-time, ~12 min)",
              file=sys.stderr)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "make_bench_data.py"),
             "--dir", DIR_240M, "--scale", "5.14", "--pairs", "10000"])
        if r.returncode != 0:
            return {}
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.runtime import run_pipeline
    al, n_expect = make_aligner(PREFIX_240M, 20000)
    devnull = open(os.devnull, "w")

    def one_pass():
        t0 = time.time()
        n = run_pipeline(al, FastxReader(fq1), FastxReader(fq2),
                         TASK_BASES, devnull, verbose=0, n_workers=4)
        assert n == n_expect
        return time.time() - t0

    one_pass()  # warm: compiles for this genome's shape/int-width buckets
    runs = sorted(one_pass() for _ in range(3))
    rps = n_expect / runs[1]
    base = FALLBACK_BASELINE_240M_RPS
    how = "stored"
    ref_pref = os.path.join(DIR_240M, "ref.genome.fa")
    if os.path.exists(REF_BIN):
        if not os.path.exists(ref_pref + ".bwt.2bit.64"):
            subprocess.run([REF_BIN, "index", "-p", ref_pref, PREFIX_240M],
                           stderr=subprocess.DEVNULL, check=True)
        base = _ref_rps(ref_pref, fq1, fq2, n_expect)
        how = "measured"
    print(f"[bench] 240Mbp: {rps:.0f} reads/s e2e ({runs[1]:.2f}s, "
          f"{n_expect} reads); baseline ({how}) {base:.0f} reads/s",
          file=sys.stderr)
    return {
        "scale_240m_rps": round(rps, 1),
        "scale_240m_vs_baseline": round(rps / base, 4),
        "scale_240m_baseline_1thread_rps": round(base, 1),
        "scale_240m_reads": n_expect,
    }


# ---------------------------------------------------------------------------
# 3.1 Gbp human-scale config (BASELINE config 4).  Runs ONLY when the
# human-genome index artifacts already exist (.tmp/human_3g1 — building
# them takes ~2.5h single-core; tools/human_diff.sh / index.build).  Reads
# are sampled on demand (~1 min).  The judge metric is per-read cost
# relative to the 240Mbp tier (VERDICT r4 item 2: within 2x).
# ---------------------------------------------------------------------------
DIR_3G1 = os.path.join(REPO, ".tmp", "human_3g1")
PREFIX_3G1 = os.path.join(DIR_3G1, "genome.fa")


def bench_3g1(make_aligner, rps_240m):
    if not os.path.exists(PREFIX_3G1 + ".bwt.2bit.64"):
        return {}
    fq1 = os.path.join(DIR_3G1, "reads_r1.fq")
    fq2 = os.path.join(DIR_3G1, "reads_r2.fq")
    if not os.path.exists(fq1):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "make_bench_data.py"),
             "--dir", DIR_3G1, "--pairs", "2000"])
        if r.returncode != 0:
            return {}
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.runtime import run_pipeline
    al, n_expect = make_aligner(PREFIX_3G1, 4000)
    devnull = open(os.devnull, "w")

    def one_pass():
        t0 = time.time()
        # 1000-read chunks: reuses the N=1024 compile bucket so a cold
        # persistent cache only ever compiles one human-scale shape
        n = run_pipeline(al, FastxReader(fq1), FastxReader(fq2),
                         150_000, devnull, verbose=0, n_workers=4)
        assert n == n_expect
        return time.time() - t0

    one_pass()  # warm
    runs = sorted(one_pass() for _ in range(2))
    rps = n_expect / runs[0]
    per_read_vs_240m = (rps_240m / rps) if (rps and rps_240m) else None
    print(f"[bench] 3.1Gbp human-scale: {rps:.0f} reads/s e2e "
          f"({runs[0]:.2f}s, {n_expect} reads); per-read cost "
          f"{per_read_vs_240m:.2f}x the 240Mbp tier", file=sys.stderr)
    return {
        "scale_3g1_rps": round(rps, 1),
        "scale_3g1_reads": n_expect,
        "scale_3g1_per_read_cost_vs_240m": round(per_read_vs_240m, 3)
        if per_read_vs_240m else None,
    }


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
    from bwamem2_tpu.utils.profiling import PROF
    for d in (PROF.t, PROF.n, PROF.c, PROF.ctot):
        d.clear()
    runs = sorted(one_pass() for _ in range(3))
    wall, cpu = runs[1]
    ours = N_READS / wall
    # per-phase wall (summed across worker threads over the 3 passes,
    # normalized to one pass) — where the device time goes
    phases = {k: round(v / 3, 2) for k, v in sorted(
        PROF.t.items(), key=lambda kv: -kv[1]) if v / 3 >= 0.05}
    print(f"[bench] ours: {ours:.0f} reads/s e2e ({wall:.2f}s, {N_READS} "
          f"2x150bp PE reads, chr21-scale, 1 chip; host cpu {cpu:.1f}s, "
          f"device-wait {100 * (1 - cpu / wall):.0f}%)", file=sys.stderr)

    base, how = measure_baseline()
    print(f"[bench] baseline (reference, 1 CPU thread, {how}): "
          f"{base:.0f} reads/s", file=sys.stderr)

    # 240Mbp scale config (same backend construction, bigger genome)
    def make_aligner(prefix, n_expect):
        fm2 = FMIndex.load(prefix)
        opt2 = MemOptions().finalize()
        opt2.flag |= MEM_F_PE
        be2 = DeviceBackend(fm2, opt2, index_prefix=prefix)
        return Aligner(fm2, opt2, backend=be2, verbose=0), n_expect

    try:
        extra = bench_240m(make_aligner)
    except Exception as e:  # keep the primary metric robust
        print(f"[bench] 240Mbp config failed: {e}", file=sys.stderr)
        extra = {}
    try:
        extra.update(bench_3g1(make_aligner,
                               extra.get("scale_240m_rps")))
    except Exception as e:
        print(f"[bench] 3.1Gbp config failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "pe_2x150_chr21scale_reads_per_sec_1chip_e2e",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / base, 4),
        "baseline_1thread_rps": round(base, 1),
        # the real bar (BASELINE.json): one v5e chip vs a 56-thread socket
        "vs_socket_target": round(ours / (SOCKET_THREADS * base), 4),
        "socket_threads": SOCKET_THREADS,
        "wall_s": round(wall, 2),
        "host_cpu_s": round(cpu, 2),
        "device_wait_frac": round(1 - cpu / wall, 3),
        "reads": N_READS,
        "phases_s": phases,
        **extra,
    }))


if __name__ == "__main__":
    main()
