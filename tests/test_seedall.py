"""Fused single-fetch seeding pipeline (ops/seedall) vs the legacy
per-stage path: the six flat output arrays (smem_off, m, n, s, occ_off,
coords) must be identical — including under forced capacity overflows,
which exercise the native-oracle patch path (_patch_chunk)."""

import os

import numpy as np
import pytest

from bwamem2_tpu.align import chain as chain_mod
from bwamem2_tpu.align.seeding import encode_reads
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.io.fastq import FastxReader, read_chunk
from bwamem2_tpu.options import MemOptions
from bwamem2_tpu.ops.backend import DeviceBackend

from conftest import DATA, FIXTURES

PREFIX = os.path.join(FIXTURES, "ref_small.fa")


@pytest.fixture(scope="module")
def fm():
    return FMIndex.load(PREFIX)


def _encs(n=80):
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                       None, 10**9)[:n]
    return encode_reads([r.seq for r in reads])


def _legacy(be, fm, encs, opt):
    smems = be.collect_smems(encs, opt)
    (allpos, smem_off, m, n, s, occ_off) = chain_mod.sa_positions_batch(
        opt, smems)
    coords = be.sa_lookup(allpos)
    return smem_off, m, n, s, occ_off, coords


def _check_equal(a, b):
    names = ("smem_off", "m", "n", "s", "occ_off", "coords")
    for nm, x, y in zip(names, a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y)), \
            f"{nm} differs: {np.asarray(x)[:10]} vs {np.asarray(y)[:10]}"


def test_fused_matches_legacy(fm):
    opt = MemOptions().finalize()
    encs = _encs()
    be = DeviceBackend(fm, opt)
    fused = be.collect_chunk(encs, opt)
    assert fused is not None
    legacy = _legacy(be, fm, encs, opt)
    _check_equal(fused, legacy)


def test_fused_with_n_bases_and_short_reads(fm):
    opt = MemOptions().finalize()
    rng = np.random.default_rng(11)
    seqs = []
    ref = open(os.path.join(DATA, "ref_small.fa")).read().splitlines()
    genome = "".join(l for l in ref if not l.startswith(">"))
    for i in range(40):
        p = int(rng.integers(0, len(genome) - 130))
        s = list(genome[p:p + int(rng.integers(24, 130))])
        for _ in range(int(rng.integers(0, 5))):
            s[int(rng.integers(0, len(s)))] = "ACGTN"[int(
                rng.integers(0, 5))]
        seqs.append("".join(s))
    seqs.append("N" * 40)          # all-N read
    seqs.append("ACGT" * 5)        # below min_seed_len
    encs = encode_reads(seqs)
    be = DeviceBackend(fm, opt)
    fused = be.collect_chunk(encs, opt)
    legacy = _legacy(be, fm, encs, opt)
    _check_equal(fused, legacy)


def test_fused_overflow_paths_match_legacy():
    """All nine forced-capacity-overflow configurations (tier-2 retries,
    oracle fallbacks, truncation suffixes, whole-read fallbacks) produce
    arrays identical to the legacy path.  Runs as ONE subprocess: the ~50
    fresh stage compiles the forced caps mint trip a context-dependent
    XLA:CPU compiler segfault inside the long-lived suite process (the
    same programs compile and pass reliably in a fresh interpreter; see
    tests/_seedall_overflow_main.py)."""
    import subprocess
    import sys

    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
           + " --xla_force_host_platform_device_count=8"}
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "_seedall_overflow_main.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    assert "SEEDALL-OVERFLOW-OK" in r.stdout


def test_fused_e2e_sam_matches_golden(fm):
    """Full pipeline through the fused path == committed golden SAM."""
    from bwamem2_tpu.align.pipeline import Aligner
    opt = MemOptions().finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                       None, 10**9)
    be = DeviceBackend(fm, opt)
    al = Aligner(fm, opt, backend=be, verbose=0)
    al.process(reads, 0)
    ours = "".join(r.sam for r in reads).splitlines(keepends=True)
    with open(os.path.join(FIXTURES, "golden_se.sam")) as f:
        golden = [l for l in f if not l.startswith("@")]
    assert ours == golden
