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
sys.path.insert(0, REPO)


def run_shard(prefix, fq1, fq2, outdir, h, n, chunk):
    cmd = [sys.executable, "-m", "bwamem2_tpu.cli", "mem", "-K", str(chunk),
           "--shard", f"{h}:{n}", "--out-dir", outdir, prefix, fq1]
    if fq2:
        cmd.append(fq2)
    t0 = time.time()
    subprocess.run(cmd, cwd=REPO, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    return time.time() - t0


def run_roundrobin(prefix, fq1, fq2, ns, chunk):
    """In-process chunk round-robin over N virtual devices (the
    production multi-chip path, runtime.run_pipeline with device-pinned
    backends).  On a single physical core the virtual devices share the
    CPU, so T(N)/T(1) measures the DISPATCH/ORDERING OVERHEAD of the
    round-robin (1.0 = free), not compute speedup; output identity across
    N is asserted."""
    import io

    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MEM_F_PE, MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline
    import jax

    fm = FMIndex.load(prefix)
    report = {}
    sam0 = None
    for n in ns:
        devs = jax.devices()[:n]
        assert len(devs) == n, f"need {n} devices, have {len(jax.devices())}"
        opt = MemOptions().finalize()
        if fq2:
            opt.flag |= MEM_F_PE
        aligners = [Aligner(fm, opt, backend=DeviceBackend(
            fm, opt, device=d, index_prefix=prefix), verbose=0)
            for d in devs]
        walls = []
        for rep in range(2):           # pass 1 warms tracing/compiles
            out = io.StringIO()
            ks1 = FastxReader(fq1)
            ks2 = FastxReader(fq2) if fq2 else None
            t0 = time.time()
            run_pipeline(aligners, ks1, ks2, chunk, out, verbose=0,
                         n_workers=max(n, 2))
            walls.append(time.time() - t0)
        sam = out.getvalue()
        if sam0 is None:
            sam0 = sam
        identical = sam == sam0
        report[n] = {"wall_s": round(walls[-1], 2),
                     "overhead_vs_1dev": None,
                     "output_identical": identical}
        print(f"[scaling-rr] N={n}: wall {walls[-1]:.1f}s, "
              f"identical: {identical}", file=sys.stderr)
    base = report[min(report)]["wall_s"]
    for n in report:
        report[n]["overhead_vs_1dev"] = round(
            report[n]["wall_s"] / base, 3)
    print(json.dumps(report))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="1,2,4")
    ap.add_argument("--dir", default=os.path.join(REPO, ".tmp",
                                                  "bench_chr21"))
    ap.add_argument("--chunk", type=int, default=750_000)
    ap.add_argument("--mode", choices=["shard", "roundrobin"],
                    default="shard")
    args = ap.parse_args()
    if args.mode == "roundrobin":
        prefix = os.path.join(args.dir, "genome.fa")
        fq1 = os.path.join(args.dir, "reads_r1.fq")
        fq2 = os.path.join(args.dir, "reads_r2.fq")
        run_roundrobin(prefix, fq1, fq2 if os.path.exists(fq2) else None,
                       [int(x) for x in args.ns.split(",")], args.chunk)
        return
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
