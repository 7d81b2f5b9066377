"""Subprocess body for test_seedall overflow-path checks.

Each forced-cap configuration compiles a fresh set of fused-stage
variants; ~50 late-process XLA:CPU compiles inside the long-lived suite
interpreter trip a context-dependent compiler segfault (see
ops/__init__.py cache notes), while the identical programs compile and
pass reliably in a fresh process — so the suite runs this file as one
subprocess.  Exactness assertion is unchanged: the fused path's six flat
output arrays must equal the legacy per-stage path's under every forced
overflow."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

CAPS_OVERRIDES = [
    dict(C1=3),                     # tier-1 cand overflow -> tier-2 retry
    dict(C1=3, C2=5),               # both tiers overflow -> oracle
    dict(MCAP=96),                  # lane + phase-cap overflow -> tier-2
    dict(MCAP=96, MT2=64),          # both tiers' lanes overflow -> oracle
    dict(C1=3, PT2=2, OVCAP=2),     # retry + oracle-list overflow -> reads
    dict(P2CAP=2),                  # round-2 pivot-lane overflow
    dict(SCAP=64),                  # merged-SMEM truncation -> read fallback
    dict(OCAP=128),                 # coordinate truncation -> read fallback
    dict(P1=2),                     # pivot-slot overflow -> whole-read oracle
]


def main() -> int:
    from bwamem2_tpu.align import chain as chain_mod
    from bwamem2_tpu.align.seeding import encode_reads
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.ops.seedall import FusedSeeder

    here = os.path.dirname(os.path.abspath(__file__))
    prefix = os.path.join(here, "fixtures", "ref_small.fa")
    data = os.path.join(here, "data")
    fm = FMIndex.load(prefix)
    reads = read_chunk(FastxReader(os.path.join(data, "reads_se.fq")),
                       None, 10**9)[:48]
    encs = encode_reads([r.seq for r in reads])
    opt = MemOptions().finalize()
    be0 = DeviceBackend(fm, opt)
    smems = be0.collect_smems(encs, opt)
    (allpos, smem_off, m, n, s, occ_off) = chain_mod.sa_positions_batch(
        opt, smems)
    coords = be0.sa_lookup(allpos)
    legacy = (smem_off, m, n, s, occ_off, coords)

    base = FusedSeeder.caps
    for i, ov in enumerate(CAPS_OVERRIDES):
        def caps(N, L, big=False, _o=ov):
            c = base(N, L, big)
            c.update(_o)
            return c
        FusedSeeder.caps = staticmethod(caps)
        be = DeviceBackend(fm, opt)
        fused = be.collect_chunk(encs, opt)
        assert fused is not None
        names = ("smem_off", "m", "n", "s", "occ_off", "coords")
        for nm, x, y in zip(names, fused, legacy):
            assert np.array_equal(np.asarray(x), np.asarray(y)), \
                f"config {i} {ov}: {nm} differs"
        print(f"override {i} {ov}: OK", flush=True)
    FusedSeeder.caps = base
    print("SEEDALL-OVERFLOW-OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
