"""Chunk-granular --resume for plain runs (SURVEY §5.4, r4 VERDICT item 7):
a run killed mid-stream and restarted with the same arguments must produce
a byte-identical output file, including a torn partial chunk at the kill
point and per-chunk PE insert-size estimation."""

import os
import signal
import subprocess
import sys
import time

from conftest import DATA, FIXTURES, REPO

PREFIX = os.path.join(FIXTURES, "ref_small.fa")
WORK = os.path.join(REPO, ".tmp", "resume_test")


def _run(out, resume=False, kill_after_chunks=None, timeout=600):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    cmd = [sys.executable, "-m", "bwamem2_tpu.cli", "mem", "-K", "20000",
           "-o", out]
    if resume:
        cmd.append("--resume")
    cmd += [PREFIX, os.path.join(DATA, "reads_r1.fq"),
            os.path.join(DATA, "reads_r2.fq")]
    if kill_after_chunks is None:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return
    # watch the journal; SIGKILL the process mid-run
    p = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL, env=env)
    jr = out + ".resume"
    t0 = time.time()
    while time.time() - t0 < timeout:
        if p.poll() is not None:
            return False   # finished before we killed it
        try:
            if sum(1 for _ in open(jr)) >= kill_after_chunks:
                break
        except OSError:
            pass
        time.sleep(0.02)
    p.send_signal(signal.SIGKILL)
    p.wait()
    return True


def test_resume_kill_restart_byte_identical():
    os.makedirs(WORK, exist_ok=True)
    ref_out = os.path.join(WORK, "full.sam")
    res_out = os.path.join(WORK, "resumed.sam")
    for f in (ref_out, res_out, res_out + ".resume"):
        if os.path.exists(f):
            os.remove(f)
    # uninterrupted run (no --resume; the flag itself must not change
    # output, covered by comparing against this)
    _run(ref_out)
    killed = _run(res_out, resume=True, kill_after_chunks=1)
    if killed:
        # simulate a torn partial chunk: append garbage past the journal
        with open(res_out, "a") as f:
            f.write("GARBAGE\tPARTIAL\tCHUNK\n")
    _run(res_out, resume=True)   # restart completes the file
    strip = lambda p: [l for l in open(p) if not l.startswith("@PG")]
    assert strip(res_out) == strip(ref_out)
    # a third invocation is a no-op on an already-complete file
    before = open(res_out).read()
    _run(res_out, resume=True)
    assert open(res_out).read() == before
