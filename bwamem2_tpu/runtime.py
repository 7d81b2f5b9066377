"""Host runtime: ordered read->compute->write pipeline.

Replicates the 3-step kt_pipeline of the reference driver (fastmap.cpp:
189-366): chunks of ~chunk_size bases stream through {read, align, write}
with the write order equal to the read order, and the next chunk's input
I/O overlapped with the current chunk's compute (double buffering).
"""

from __future__ import annotations

import queue
import sys
import threading
import time

from .io.fastq import FastxReader, read_chunk
from .utils.profiling import PROF


def run_pipeline(aligner, ks1: FastxReader, ks2: FastxReader | None,
                 task_size: int, out, pes0=None, copy_comment=False,
                 pipeline_depth: int = 2, verbose: int = 3,
                 n_workers: int = 2) -> int:
    """Stream chunks through the aligner; returns total reads processed.

    `n_workers` compute threads each process whole chunks: while one blocks
    on the device (GIL released), the other runs the host-side python
    (chaining / SAM finalization) — the TPU analog of the reference's
    2-thread kt_pipeline overlap.  Chunk boundaries and per-chunk state
    (pestat, n_processed bases) are fixed by the single reader, and the
    writer emits strictly in chunk order, so output is bit-identical for
    any worker count.

    `aligner` may be a LIST of aligners (one per chip, each with a
    device-pinned backend): chunks round-robin across them — data
    parallelism over chips with a replicated index and zero collectives,
    the scale-out shape of SURVEY §5.8."""
    aligners = aligner if isinstance(aligner, (list, tuple)) else [aligner]
    q_in: queue.Queue = queue.Queue(maxsize=max(pipeline_depth, n_workers))
    done = object()

    def reader():
        n = 0
        idx = 0
        while True:
            reads = read_chunk(ks1, ks2, task_size)
            if not reads:
                for _ in range(max(n_workers, 1)):
                    q_in.put(done)
                return
            if not copy_comment:
                for r in reads:
                    r.comment = None
            q_in.put((idx, n, reads))
            idx += 1
            n += len(reads)

    results: dict[int, list] = {}
    res_lock = threading.Condition()
    n_done_workers = [0]

    worker_err: list = []

    def worker():
        while True:
            item = q_in.get()
            if item is done:
                with res_lock:
                    n_done_workers[0] += 1
                    res_lock.notify_all()
                return
            idx, base, reads = item
            t0 = time.time()
            try:
                aligners[idx % len(aligners)].process(reads, base,
                                                      pes0=pes0)
            except BaseException as e:  # propagate to the writer thread
                with res_lock:
                    worker_err.append(e)
                    n_done_workers[0] += 1
                    res_lock.notify_all()
                return
            with res_lock:
                results[idx] = (reads, time.time() - t0)
                res_lock.notify_all()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    nw = max(n_workers, 1)
    workers = [threading.Thread(target=worker, daemon=True)
               for _ in range(nw)]
    for w in workers:
        w.start()

    n_processed = 0
    next_idx = 0
    while True:
        with res_lock:
            while (next_idx not in results and n_done_workers[0] < nw
                   and not worker_err):
                res_lock.wait()
            if worker_err:
                raise worker_err[0]
            if next_idx not in results:
                break  # all workers done and nothing pending
            reads, dt = results.pop(next_idx)
        next_idx += 1
        n_processed += len(reads)
        with PROF("write_output"):
            for r in reads:
                out.write(r.sam)
                r.sam = None
        if verbose >= 3:
            sys.stderr.write(
                f"[M::pipeline] processed {len(reads)} reads in "
                f"{dt:.3f} sec (total {n_processed})\n")
    t.join()
    for w in workers:
        w.join()
    if verbose >= 3:
        PROF.report(total_reads=n_processed)
    return n_processed
