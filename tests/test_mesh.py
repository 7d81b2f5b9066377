"""Output-identity tests for the pjit/mesh paths (VERDICT r2 item 10).

Runs on the suite's 8-virtual-CPU-device mesh: the fused seed-extend step
under (a) data sharding with a replicated index and (b) genome-bucket
index sharding must be bit-identical to the single-device step.  The same
assertions run in `__graft_entry__.dryrun_multichip`; this keeps them in
the always-on suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.ops.device_index import DeviceFMIndex
from bwamem2_tpu.ops.entry import seed_extend_step
from bwamem2_tpu.parallel.mesh import make_mesh, sharded_seed_extend

from conftest import FIXTURES
import os

TINY = os.path.join(FIXTURES, "ref_tiny.fa")


@pytest.fixture(scope="module")
def setup():
    fm = FMIndex.load(TINY)
    dfm = DeviceFMIndex.from_host(fm)
    rng = np.random.default_rng(0)
    n, L = 16, 128
    enc = np.full((n, L), 4, np.int32)
    lens = np.full((n,), L, np.int32)
    for i in range(n):
        p = int(rng.integers(0, fm.l_pac - L))
        enc[i] = fm.ref_string[p:p + L]
        mut = rng.integers(0, L, 3)
        enc[i, mut] = (enc[i, mut] + 1) % 4
    want = [np.asarray(o) for o in
            seed_extend_step(dfm, jnp.asarray(enc), jnp.asarray(lens))]
    return dfm, enc, lens, want


def test_replicated_index_data_sharding(setup):
    dfm, enc, lens, want = setup
    mesh = make_mesh(len(jax.devices()))
    out = sharded_seed_extend(mesh, dfm, enc, lens)
    assert len(out) == len(want)
    for w, g in zip(want, out):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_genome_bucket_index_sharding(setup):
    from bwamem2_tpu.parallel.shard_index import (
        sharded_seed_extend_sharded_index)
    dfm, enc, lens, want = setup
    mesh = make_mesh(len(jax.devices()))
    out = sharded_seed_extend_sharded_index(mesh, dfm, enc, lens)
    for w, g in zip(want, out):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_roundrobin_pe_chunk_stream_identity_n8():
    """The production multi-chip path — chunks round-robin over 8
    device-pinned backends through the FULL mem pipeline (fused seeding,
    extension, pairing) — is output-bit-identical to the single-device run
    for a multi-chunk PE stream (r4 VERDICT item 6's always-on half; the
    bench-scale decomposition numbers live in tools/scaling_bench.py
    --mode roundrobin and the README table).

    Runs in a SUBPROCESS: compiling the 8 per-device executable variants
    inside the long-lived suite process trips a context-dependent
    XLA:CPU compile segfault (single-threaded, no cache involved); the
    same program compiles and passes reliably in a fresh process."""
    import subprocess
    import sys

    prog = r"""
import io, os, sys
sys.path.insert(0, %r)
from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader
from bwamem2_tpu.options import MEM_F_PE, MemOptions
from bwamem2_tpu.ops.backend import DeviceBackend
from bwamem2_tpu.runtime import run_pipeline
import jax

prefix = %r
fq1 = %r
fq2 = %r
fm = FMIndex.load(prefix)
sams = {}
for n in (1, 8):
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE
    aligners = [Aligner(fm, opt, backend=DeviceBackend(fm, opt, device=d),
                        verbose=0) for d in jax.devices()[:n]]
    out = io.StringIO()
    # -K 20000 -> ~6 chunks: chunk-held state (pestat, read-id bases)
    # must be preserved across the device round-robin
    run_pipeline(aligners, FastxReader(fq1), FastxReader(fq2),
                 20000, out, verbose=0, n_workers=max(n, 2))
    sams[n] = out.getvalue()
assert sams[8] == sams[1]
assert sams[1].count("\n") >= 700
print("RR-IDENTITY-OK")
"""
    import os as _os
    repo = REPO if "REPO" in globals() else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    prog = prog % (repo,
                   os.path.join(FIXTURES, "ref_small.fa"),
                   os.path.join(os.path.dirname(FIXTURES), "data",
                                "reads_r1.fq"),
                   os.path.join(os.path.dirname(FIXTURES), "data",
                                "reads_r2.fq"))
    env = {**_os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": _os.environ.get("XLA_FLAGS", "")
           + " --xla_force_host_platform_device_count=8"}
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=1500, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "RR-IDENTITY-OK" in r.stdout
