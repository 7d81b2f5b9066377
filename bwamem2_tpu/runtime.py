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
                 pipeline_depth: int = 2, verbose: int = 3) -> int:
    """Stream chunks through the aligner; returns total reads processed."""
    q: queue.Queue = queue.Queue(maxsize=max(pipeline_depth - 1, 0) or 1)
    done = object()

    def reader():
        while True:
            reads = read_chunk(ks1, ks2, task_size)
            if not reads:
                q.put(done)
                return
            if not copy_comment:
                for r in reads:
                    r.comment = None
            q.put(reads)

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    n_processed = 0
    while True:
        reads = q.get()
        if reads is done:
            break
        t0 = time.time()
        aligner.process(reads, n_processed, pes0=pes0)
        n_processed += len(reads)
        with PROF("write_output"):
            for r in reads:
                out.write(r.sam)
                r.sam = None
        if verbose >= 3:
            sys.stderr.write(
                f"[M::pipeline] processed {len(reads)} reads in "
                f"{time.time()-t0:.3f} sec (total {n_processed})\n")
    t.join()
    if verbose >= 3:
        PROF.report(total_reads=n_processed)
    return n_processed
