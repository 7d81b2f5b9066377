"""One profiled bench pass on the real chip: phase table + counters.

Usage: python tools/prof_bench.py [--reads N] [--dir .tmp/bench_chr21]
"""
import argparse
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".tmp",
                                                  "bench_chr21"))
    ap.add_argument("--fq-prefix", default="reads")
    ap.add_argument("--task-bases", type=int, default=750_000)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--passes", type=int, default=1)
    args = ap.parse_args()

    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MEM_F_PE, MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline
    from bwamem2_tpu.utils.profiling import PROF

    prefix = os.path.join(args.dir, "genome.fa")
    fq1 = os.path.join(args.dir, f"{args.fq_prefix}_r1.fq")
    fq2 = os.path.join(args.dir, f"{args.fq_prefix}_r2.fq")
    fm = FMIndex.load(prefix)
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    backend = DeviceBackend(fm, opt, index_prefix=prefix)
    al = Aligner(fm, opt, backend=backend, verbose=0)
    devnull = open(os.devnull, "w")

    def one_pass():
        t0 = time.time()
        ru0 = resource.getrusage(resource.RUSAGE_SELF)
        n = run_pipeline(al, FastxReader(fq1), FastxReader(fq2),
                         args.task_bases, devnull, verbose=0,
                         n_workers=args.workers)
        ru1 = resource.getrusage(resource.RUSAGE_SELF)
        cpu = (ru1.ru_utime - ru0.ru_utime) + (ru1.ru_stime - ru0.ru_stime)
        return n, time.time() - t0, cpu

    n, w, c = one_pass()   # warm
    print(f"[warm] {n} reads {w:.2f}s wall {c:.2f}s cpu", file=sys.stderr)
    # reset profile, timed pass
    PROF.t.clear(); PROF.n.clear(); PROF.c.clear(); PROF.ctot.clear()
    for _ in range(args.passes):
        n, w, c = one_pass()
        print(f"[timed] {n} reads {w:.2f}s wall {c:.2f}s cpu "
              f"({n / w:.0f} reads/s)", file=sys.stderr)
    PROF.report(total_reads=n * args.passes)


if __name__ == "__main__":
    main()
