"""Multi-host scaling-efficiency harness (BASELINE: >85% at N hosts).

Runs the deterministic shard decomposition (`--shard h:N`) for each N and
reports per-shard wall time and scaling efficiency.  On a real pod, launch
one process per host concurrently (each with JAX_COORDINATOR_ADDRESS etc.
for jax.distributed bring-up) and efficiency is

    T(1) / (N * max_h T_shard(h, N))

On this single-chip dev box the shards necessarily run back-to-back, so the
harness reports the same metric from sequential runs — it measures the real
sharding overheads (per-process index load + compile-cache warm + chunk
skipping + merge) while the device work is the one-chip throughput.  Usage:

    python tools/scaling_bench.py [--ns 1,2,4] [--dir .tmp/bench_chr21]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_shard(prefix, fq1, fq2, outdir, h, n, chunk):
    cmd = [sys.executable, "-m", "bwamem2_tpu.cli", "mem", "-K", str(chunk),
           "--shard", f"{h}:{n}", "--out-dir", outdir, prefix, fq1]
    if fq2:
        cmd.append(fq2)
    t0 = time.time()
    subprocess.run(cmd, cwd=REPO, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="1,2,4")
    ap.add_argument("--dir", default=os.path.join(REPO, ".tmp",
                                                  "bench_chr21"))
    ap.add_argument("--chunk", type=int, default=750_000)
    args = ap.parse_args()
    prefix = os.path.join(args.dir, "genome.fa")
    fq1 = os.path.join(args.dir, "reads_r1.fq")
    fq2 = os.path.join(args.dir, "reads_r2.fq")
    fq2 = fq2 if os.path.exists(fq2) else None

    results = {}
    sams = {}
    for n in [int(x) for x in args.ns.split(",")]:
        outdir = os.path.join(args.dir, f"shards_{n}")
        if os.path.isdir(outdir):
            shutil.rmtree(outdir)
        times = [run_shard(prefix, fq1, fq2, outdir, h, n, args.chunk)
                 for h in range(n)]
        results[n] = times
        parts = sorted(os.path.join(outdir, f)
                       for f in os.listdir(outdir)
                       if f.startswith("part.chunk") and f.endswith(".sam"))
        merged = os.path.join(outdir, "merged.sam")
        subprocess.run([sys.executable, "-m", "bwamem2_tpu.cli", "merge",
                        merged] + parts, cwd=REPO, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(merged) as f:
            sams[n] = "".join(l for l in f if not l.startswith("@"))
        print(f"[scaling] N={n}: shard walls "
              f"{['%.1f' % t for t in times]}s", file=sys.stderr)

    base = max(results[min(results)])
    report = {}
    for n, times in results.items():
        eff = base / (n * max(times))
        identical = sams[n] == sams[min(results)]
        report[n] = {"max_shard_wall_s": round(max(times), 2),
                     "efficiency": round(eff, 3),
                     "output_identical": identical}
        print(f"[scaling] N={n}: efficiency {eff:.2%}, "
              f"output identical: {identical}", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
