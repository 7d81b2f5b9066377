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


@pytest.mark.parametrize("caps_override", [
    dict(C1=3),                     # tier-1 cand overflow -> tier-2 retry
    dict(C1=3, C2=5),               # both tiers overflow -> oracle
    dict(MCAP=96),                  # lane + phase-cap overflow -> tier-2
    dict(MCAP=96, MT2=64),          # both tiers' lanes overflow -> oracle
    dict(C1=3, PT2=2, OVCAP=2),     # retry + oracle-list overflow -> reads
    dict(P2CAP=2),                  # round-2 pivot-lane overflow
    dict(SCAP=64),                  # merged-SMEM truncation -> read fallback
    dict(OCAP=128),                 # coordinate truncation -> read fallback
    dict(P1=2),                     # pivot-slot overflow -> whole-read oracle
])
def test_fused_overflow_paths_match_legacy(fm, caps_override, monkeypatch):
    from bwamem2_tpu.ops.seedall import FusedSeeder
    base = FusedSeeder.caps

    def caps(N, L, big=False, _b=base, _o=caps_override):
        c = _b(N, L, big)
        c.update(_o)
        return c

    monkeypatch.setattr(FusedSeeder, "caps", staticmethod(caps))
    opt = MemOptions().finalize()
    encs = _encs(48)
    be = DeviceBackend(fm, opt)
    fused = be.collect_chunk(encs, opt)
    assert fused is not None
    legacy = _legacy(be, fm, encs, opt)
    _check_equal(fused, legacy)


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
