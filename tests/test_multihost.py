"""Determinism of multi-host sharding: the chunk-ordered merge of N shard
runs must be bit-identical to a single-host run (SE and PE)."""

import glob
import io
import os

import pytest

from bwamem2_tpu.align.pipeline import Aligner
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MEM_F_PE, MemOptions
from bwamem2_tpu.parallel.multihost import merge_chunks, run_sharded
from bwamem2_tpu.runtime import run_pipeline

from conftest import DATA, FIXTURES

PREFIX = os.path.join(FIXTURES, "ref_small.fa")
CHUNK = 30000  # bases per chunk -> several chunks over the read sets


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(PREFIX)


def single_run(fm, paired):
    opt = MemOptions().finalize()
    ks2 = None
    if paired:
        opt.flag |= MEM_F_PE
        ks1 = FastxReader(os.path.join(DATA, "reads_r1.fq"))
        ks2 = FastxReader(os.path.join(DATA, "reads_r2.fq"))
    else:
        ks1 = FastxReader(os.path.join(DATA, "reads_se.fq"))
    out = io.StringIO()
    run_pipeline(Aligner(fm, opt, verbose=0), ks1, ks2, CHUNK, out,
                 verbose=0)
    return out.getvalue()


@pytest.mark.parametrize("paired", [False, True], ids=["se", "pe"])
@pytest.mark.parametrize("n_shards", [2, 3])
def test_sharded_merge_identical(fm, paired, n_shards, tmp_path):
    want = single_run(fm, paired)
    out_dir = str(tmp_path / f"shards{n_shards}")
    for h in range(n_shards):
        opt = MemOptions().finalize()
        ks2 = None
        if paired:
            opt.flag |= MEM_F_PE
            ks1 = FastxReader(os.path.join(DATA, "reads_r1.fq"))
            ks2 = FastxReader(os.path.join(DATA, "reads_r2.fq"))
        else:
            ks1 = FastxReader(os.path.join(DATA, "reads_se.fq"))
        run_sharded(Aligner(fm, opt, verbose=0), ks1, ks2, CHUNK, out_dir,
                    h, n_shards, verbose=0)
    out = io.StringIO()
    n = merge_chunks(out, glob.glob(os.path.join(out_dir, "part.chunk*.sam")))
    assert n > 0
    assert out.getvalue() == want


def test_multi_device_chunk_round_robin():
    """Chunks round-robin across device-pinned backends (data parallelism
    over chips, replicated index): output bit-identical to one device."""
    import io
    import os

    import jax

    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline
    from conftest import DATA, FIXTURES

    fm = FMIndex.load(os.path.join(FIXTURES, "ref_small.fa"))
    opt = MemOptions().finalize()
    devs = jax.devices()
    assert len(devs) >= 2
    aligners = [Aligner(fm, opt, backend=DeviceBackend(fm, opt, device=d),
                        verbose=0) for d in devs[:2]]
    fq = os.path.join(DATA, "reads_se.fq")

    def run(al):
        out = io.StringIO()
        n = run_pipeline(al, FastxReader(fq), None, 8000, out, verbose=0,
                         n_workers=2)
        assert n > 0
        return out.getvalue()

    two = run(aligners)
    one = run(aligners[0])
    assert two == one
    with open(os.path.join(FIXTURES, "golden_se.sam")) as f:
        golden = "".join(l for l in f if not l.startswith("@"))
    assert two == golden
