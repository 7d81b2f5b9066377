"""Least-loaded chip dispatch in run_pipeline (kthread work-stealing
analog, kthread.cpp:41-50): a pathological chunk occupies one aligner
while other chunks drain over the rest, and output stays in chunk order.

Pure stub test — no JAX, no index; exercises only the scheduler."""

import io
import threading
import time

from bwamem2_tpu.io.fastq import Read
from bwamem2_tpu.runtime import run_pipeline


class _StubReader:
    """FastxReader stand-in yielding n_reads one-base reads."""

    def __init__(self, n_reads):
        self.left = n_reads
        self.i = 0

    def read_one(self):
        if self.left == 0:
            return None
        self.left -= 1
        r = Read(name=f"r{self.i}", comment=None, seq="A", qual="I")
        self.i += 1
        return r


class _StubAligner:
    def __init__(self, tag, slow_chunk_base=None, log=None, lock=None):
        self.tag = tag
        self.slow_chunk_base = slow_chunk_base
        self.log = log if log is not None else []
        self.lock = lock or threading.Lock()
        self._pipeline_warm = True   # skip the warm serialization

    def process(self, reads, base, pes0=None):
        with self.lock:
            self.log.append((self.tag, base))
        if self.slow_chunk_base is not None and base == self.slow_chunk_base:
            time.sleep(0.25)         # the pathological chunk
        else:
            time.sleep(0.005)
        for r in reads:
            r.sam = f"{r.name}\t{self.tag}\n"
        return len(reads)


def test_least_loaded_dispatch_drains_around_slow_chunk():
    log, lock = [], threading.Lock()
    # aligner 0 is slow on the FIRST chunk (base 0); 8 chunks of 2 reads
    a0 = _StubAligner(0, slow_chunk_base=0, log=log, lock=lock)
    a1 = _StubAligner(1, log=log, lock=lock)
    out = io.StringIO()
    n = run_pipeline([a0, a1], _StubReader(16), None, 2, out,
                     verbose=0, n_workers=2)
    assert n == 16
    # output is in chunk (read) order regardless of schedule
    names = [line.split("\t")[0] for line in out.getvalue().splitlines()]
    assert names == [f"r{i}" for i in range(16)]
    # while aligner 0 sat on the slow chunk, aligner 1 took the rest:
    # static round-robin would give each 4 chunks; least-loaded must
    # route strictly more than half to aligner 1
    counts = {0: 0, 1: 0}
    for tag, _ in log:
        counts[tag] += 1
    assert counts[0] + counts[1] == 8
    assert counts[1] >= 6, counts


def test_reader_exception_propagates():
    """A reader-side failure (e.g. malformed FASTQ mid-stream) must raise
    out of run_pipeline, not hang the workers/writer forever."""
    import pytest

    class _BadReader(_StubReader):
        def read_one(self):
            if self.i >= 4:
                raise ValueError("malformed record")
            return super().read_one()

    a = _StubAligner(0)
    with pytest.raises(ValueError, match="malformed record"):
        run_pipeline(a, _BadReader(16), None, 2, io.StringIO(),
                     verbose=0, n_workers=2)


def test_single_aligner_unaffected():
    a = _StubAligner(0)
    out = io.StringIO()
    n = run_pipeline(a, _StubReader(6), None, 2, out, verbose=0,
                     n_workers=3)
    assert n == 6
    names = [line.split("\t")[0] for line in out.getvalue().splitlines()]
    assert names == [f"r{i}" for i in range(6)]
