"""jax.distributed smoke test: two REAL local processes with a coordinator.

Each worker process initializes jax.distributed against a shared
coordinator, checks the global process view, runs a cross-process psum, and
aligns its deterministic chunk shard (`--shard h:2` semantics); the parent
merges the shard outputs and asserts bit-identity with an unsharded run.
This is the SURVEY §5.8 bring-up path that a real pod uses (there,
initialize() auto-detects; here the coordinator env triple drives it).
"""

import os
import socket
import subprocess
import sys

import pytest

from conftest import DATA, FIXTURES, REPO

PREFIX = os.path.join(FIXTURES, "ref_small.fa")
WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
from bwamem2_tpu.parallel.multihost import init_distributed
pid, n = init_distributed()
assert n == 2, f"process_count {{n}}"
assert pid == int(os.environ["JAX_PROCESS_ID"])
# cross-process collective: psum over one device per process
import jax.numpy as jnp
from jax.experimental import multihost_utils
val = multihost_utils.process_allgather(jnp.int32(pid + 1))
assert sorted(val.tolist()) == [1, 2], val
# shard h:2 of the SE fixture (host-oracle aligner: tiny read set)
from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader
from bwamem2_tpu.options import MemOptions
from bwamem2_tpu.parallel.multihost import run_sharded
fm = FMIndex.load({prefix!r})
opt = MemOptions().finalize()
al = Aligner(fm, opt, verbose=0)
n_mine = run_sharded(al, FastxReader({fq!r}), None, 16000,
                     {outdir!r}, pid, 2, verbose=0)
print("worker", pid, "reads", n_mine)
"""


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_shard(tmp_path):
    fq = os.path.join(DATA, "reads_se.fq")
    outdir = str(tmp_path / "shards")
    port = free_port()
    env = dict(os.environ)
    env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
               JAX_NUM_PROCESSES="2", JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    script = WORKER.format(repo=REPO, prefix=PREFIX, fq=fq, outdir=outdir)
    procs = []
    for pid in range(2):
        e = dict(env)
        e["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen([sys.executable, "-c", script],
                                      env=e, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=570) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    # merge shard chunks in order and compare with an unsharded run
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.parallel.multihost import merge_chunks
    import io
    merged = io.StringIO()
    paths = [os.path.join(outdir, f) for f in sorted(os.listdir(outdir))]
    assert len(paths) >= 2, "expected chunks from both shards"
    merge_chunks(merged, paths)

    fm = FMIndex.load(PREFIX)
    opt = MemOptions().finalize()
    al = Aligner(fm, opt, verbose=0)
    want = []
    n_processed = 0
    ks = FastxReader(fq)
    while True:
        reads = read_chunk(ks, None, 16000)
        if not reads:
            break
        for r in reads:
            r.comment = None
        al.process(reads, n_processed)
        want.extend(r.sam for r in reads)
        n_processed += len(reads)
    assert merged.getvalue() == "".join(want)
