"""-v 4 debug-dump parity vs the reference binary (r4 VERDICT item 8).

The reference's bwamem.cpp emits five verbose>=4 diagnostics (potential hit
merge / merge test / merge score in mem_patch_reg, bwamem.cpp:191-220; band
width / final alignment in mem_reg2aln, bwamem.cpp:1755-1762).  Both our
native runtime and the python spec path must reproduce them byte-for-byte.
Auto-skips without .refbuild (like the other differential suites); the
exit-time parameter echo is checked unconditionally.
"""

import os
import re
import subprocess
import sys

import pytest

from conftest import DATA, FIXTURES, REPO

REF_BIN = os.path.join(REPO, ".refbuild", "bwa-mem2.ref")
PREFIX = os.path.join(FIXTURES, "ref_small.fa")
PAT = re.compile(r"potential hit merge|score=|Band width|Final alignment")


def _dump_lines(err: str) -> list[str]:
    return [l for l in err.splitlines() if l.startswith("* ")
            and PAT.search(l)]


def _ours(extra_env=None) -> str:
    env = {**os.environ, "JAX_PLATFORMS": "cpu", **(extra_env or {})}
    r = subprocess.run(
        [sys.executable, "-m", "bwamem2_tpu.cli", "mem", "-v", "4",
         PREFIX, os.path.join(DATA, "reads_hard.fq")],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stderr


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_v4_dumps_match_reference():
    rr = subprocess.run([REF_BIN, "mem", "-v", "4", PREFIX,
                         os.path.join(DATA, "reads_hard.fq")],
                        capture_output=True, text=True, timeout=300)
    assert rr.returncode == 0
    ours = _dump_lines(_ours())
    ref = _dump_lines(rr.stderr)
    assert len(ref) > 0          # the corpus must actually trigger dumps
    assert ours == ref


def test_exit_parameter_echo():
    err = _ours()
    assert "Important parameter settings:" in err
    for key in ("MAX_SEQ_LEN_REF", "MAX_SEQ_LEN_QER", "VPU_LANES",
                "SEED_CAND_SLOTS"):
        assert key in err
