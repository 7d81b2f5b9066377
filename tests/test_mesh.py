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
