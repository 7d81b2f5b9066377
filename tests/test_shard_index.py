"""Genome-bucket index sharding: bit-identity vs the replicated index.

Runs on the virtual 8-device CPU mesh (conftest).  The sharded layout
splits occp/sa_ms/sa_ls by contiguous row range over the mesh axis and
fetches rows with all_gather + local-gather + psum_scatter
(ops.device_index._dist_rows); every result must equal the replicated
path exactly — same gathers, same arithmetic, different transport.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.ops.device_index import DeviceFMIndex, occ_all4, \
    bwt_char_occ, occ_one
from bwamem2_tpu.ops.salookup import sa_lookup_kernel
from bwamem2_tpu.parallel.mesh import make_mesh
from bwamem2_tpu.parallel.shard_index import (index_specs, shard_index,
                                              sharded_kernel,
                                              sharded_seed_extend_sharded_index)

from conftest import FIXTURES
import os

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device CPU mesh")


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(os.path.join(FIXTURES, "ref_small.fa"))


@pytest.fixture(scope="module")
def dfm(fm):
    return DeviceFMIndex.from_host(fm)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_occ_rows_match(fm, dfm, mesh):
    rng = np.random.default_rng(0)
    n = 4096  # multiple of mesh size
    pos = jnp.asarray(rng.integers(0, 2 * fm.l_pac, n), jnp.int64)
    ref_occ = np.asarray(occ_all4(dfm, pos))
    ref_bc = [np.asarray(x) for x in bwt_char_occ(dfm, pos)]
    c = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    ref_one = np.asarray(occ_one(dfm, pos, c))

    sdfm = shard_index(mesh, dfm)
    spec = index_specs(sdfm)

    f1 = sharded_kernel(mesh, occ_all4, spec, 1)
    got = np.asarray(f1(sdfm, pos))
    np.testing.assert_array_equal(got, ref_occ)

    f2 = sharded_kernel(mesh, bwt_char_occ, spec, 1, out_specs=(P("data"),
                                                                P("data")))
    got_c, got_o = f2(sdfm, pos)
    np.testing.assert_array_equal(np.asarray(got_c), ref_bc[0])
    np.testing.assert_array_equal(np.asarray(got_o), ref_bc[1])

    f3 = sharded_kernel(mesh, occ_one, spec, 2)
    np.testing.assert_array_equal(np.asarray(f3(sdfm, pos, c)), ref_one)


def test_sa_lookup_match(fm, dfm, mesh):
    rng = np.random.default_rng(1)
    n = 2048
    pos = jnp.asarray(rng.integers(0, 2 * fm.l_pac, n), jnp.int64)
    want = np.asarray(sa_lookup_kernel(dfm, pos))
    sdfm = shard_index(mesh, dfm)
    f = sharded_kernel(mesh, sa_lookup_kernel, index_specs(sdfm), 1)
    np.testing.assert_array_equal(np.asarray(f(sdfm, pos)), want)


def test_seed_extend_sharded_index_bitidentical(fm, dfm, mesh):
    from bwamem2_tpu.ops.entry import seed_extend_step
    rng = np.random.default_rng(2)
    n, L = 32, 128
    enc = np.full((n, L), 4, np.int32)
    lens = np.full((n,), L, np.int32)
    for i in range(n):
        p = int(rng.integers(0, fm.l_pac - L))
        enc[i] = fm.ref_string[p:p + L]
        mut = rng.integers(0, L, 3)
        enc[i, mut] = (enc[i, mut] + 1) % 4
    want = [np.asarray(o) for o in
            seed_extend_step(dfm, jnp.asarray(enc), jnp.asarray(lens))]
    got = sharded_seed_extend_sharded_index(mesh, dfm, enc, lens)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g, w)


def test_shard_memory_split(fm, dfm, mesh):
    """Each device holds ~1/8 of the sharded tables (the capacity story)."""
    sdfm = shard_index(mesh, dfm)
    total = dfm.occp.size * 4 + dfm.sa_ms.size + dfm.sa_ls.size * 4
    shards = sdfm.occp.addressable_shards
    assert len(shards) == 8
    per_dev = shards[0].data.size * 4
    assert per_dev <= total // 8 + 64 * 4


def test_production_pipeline_sharded_index(mesh):
    """The FULL production `mem` path (DeviceBackend(mesh=...) → Aligner →
    run_pipeline) with the index genome-bucket-sharded over the 8-device
    mesh: SAM output must be bit-identical to the replicated-index
    backend.  This is the §5.8 deployment wired end to end, not the fused
    demo step."""
    import io
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MEM_F_PE, MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline
    from conftest import DATA

    prefix = os.path.join(FIXTURES, "ref_small.fa")
    fm2 = FMIndex.load(prefix)
    fq1 = os.path.join(DATA, "reads_r1.fq")
    fq2 = os.path.join(DATA, "reads_r2.fq")
    opt = MemOptions().finalize()
    opt.flag |= MEM_F_PE

    def run(be):
        al = Aligner(fm2, opt, backend=be, verbose=0)
        out = io.StringIO()
        n = run_pipeline(al, FastxReader(fq1), FastxReader(fq2), 30000,
                         out, verbose=0, n_workers=2)
        return n, out.getvalue()

    n_rep, sam_rep = run(DeviceBackend(fm2, opt, index_prefix=prefix))
    n_sh, sam_sh = run(DeviceBackend(fm2, opt, index_prefix=prefix,
                                     mesh=mesh))
    assert n_rep == n_sh and n_rep > 0
    assert sam_rep == sam_sh


def test_sharded_hi_plane_fused_gather(mesh):
    """has_hi index sharded over the mesh: the fused one-collective-round
    occp+occ_hi fetch (_dist_rows_fused) must equal the replicated path."""
    from bwamem2_tpu.ops.device_index import pack_occ_rows
    rng = np.random.default_rng(9)
    n = 64 * 40                       # 40 blocks, 5 rows/device
    sent = 777
    bwt = rng.integers(0, 4, n).astype(np.int64)
    base = np.array([(3 << 32) | 5, (131 << 32) | 7,
                     (1 << 32) | 11, (144 << 32) | 13], np.int64)
    nb = n // 64
    one_hot = np.zeros((nb, 4), np.uint64)
    cp = np.zeros((nb, 4), np.int64)
    run = base.copy()
    for b in range(nb):
        cp[b] = run
        for p in range(64 * b, 64 * b + 64):
            if p == sent:
                continue
            one_hot[b, bwt[p]] |= np.uint64(1) << np.uint64(63 - (p & 63))
            run[bwt[p]] += 1
    occp, occ_hi = pack_occ_rows(cp, one_hot)
    dummy64 = jnp.zeros(1, jnp.int64)
    dfm_hi = DeviceFMIndex(
        occp=jnp.asarray(occp), occ_hi=jnp.asarray(occ_hi),
        counts=jnp.zeros(5, jnp.int64),
        sa_ms=jnp.zeros(1, jnp.int8), sa_ls=jnp.zeros(1, jnp.uint32),
        sentinel=jnp.int64(sent), ref=jnp.zeros(1, jnp.uint8),
        lut_k=dummy64, lut_s=dummy64, has_hi=True)
    pos = jnp.asarray(rng.integers(0, n, 1024), jnp.int64)
    c = jnp.asarray(rng.integers(0, 4, 1024), jnp.int32)
    want4 = np.asarray(occ_all4(dfm_hi, pos))
    want1 = np.asarray(occ_one(dfm_hi, pos, c))
    wantb = [np.asarray(x) for x in bwt_char_occ(dfm_hi, pos)]

    sdfm = shard_index(mesh, dfm_hi)
    assert sdfm.has_hi
    spec = index_specs(sdfm)
    f4 = sharded_kernel(mesh, occ_all4, spec, 1)
    np.testing.assert_array_equal(np.asarray(f4(sdfm, pos)), want4)
    f1 = sharded_kernel(mesh, occ_one, spec, 2)
    np.testing.assert_array_equal(np.asarray(f1(sdfm, pos, c)), want1)
    fb = sharded_kernel(mesh, bwt_char_occ, spec, 1,
                        out_specs=(P("data"), P("data")))
    got_c, got_o = fb(sdfm, pos)
    np.testing.assert_array_equal(np.asarray(got_c), wantb[0])
    np.testing.assert_array_equal(np.asarray(got_o), wantb[1])
