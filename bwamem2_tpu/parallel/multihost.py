"""Multi-host scale-out: deterministic sharded runs + chunk-ordered merge.

The reference scales across nodes by splitting the FASTQ externally
(SURVEY.md §2.6 "multi-process scale-out"); here sharding is built in and
deterministic: with N shards, shard h aligns exactly the chunks c with
c % N == h (chunk boundaries depend only on chunk_size, never on N), so the
union of shard outputs concatenated in chunk order is bit-identical to a
single-host run.  Insert-size estimation stays per-chunk exactly as in the
reference, so PE output is also invariant to sharding.

On a TPU pod: run one process per host with --shard h:N (after
jax.distributed.initialize()); each host's local chip(s) serve its chunks;
merge afterwards (no inter-host communication on the critical path).
"""

from __future__ import annotations

import os
import re
import sys

from ..io.fastq import FastxReader, read_chunk
from ..utils.profiling import PROF

CHUNK_RE = re.compile(r"\.chunk(\d+)\.sam$")


def run_sharded(aligner, ks1: FastxReader, ks2: FastxReader | None,
                task_size: int, out_dir: str, shard: int, n_shards: int,
                pes0=None, copy_comment=False, verbose: int = 3) -> int:
    """Align chunks c ≡ shard (mod n_shards); write out_dir/part.chunk{c}.sam."""
    os.makedirs(out_dir, exist_ok=True)
    c = 0
    n_processed = 0
    n_mine = 0
    while True:
        reads = read_chunk(ks1, ks2, task_size)
        if not reads:
            break
        if c % n_shards == shard:
            if not copy_comment:
                for r in reads:
                    r.comment = None
            aligner.process(reads, n_processed, pes0=pes0)
            path = os.path.join(out_dir, f"part.chunk{c:08d}.sam")
            with open(path, "w") as f:
                for r in reads:
                    f.write(r.sam)
                    r.sam = None
            n_mine += len(reads)
            if verbose >= 3:
                sys.stderr.write(f"[shard {shard}/{n_shards}] chunk {c}: "
                                 f"{len(reads)} reads\n")
        n_processed += len(reads)
        c += 1
    if verbose >= 3:
        PROF.report(total_reads=n_mine)
    return n_mine


def merge_chunks(out, paths: list[str], header: str | None = None) -> int:
    """Concatenate chunk files in chunk-index order (deterministic merge)."""
    tagged = []
    for p in paths:
        m = CHUNK_RE.search(p)
        if not m:
            raise ValueError(f"not a chunk file: {p}")
        tagged.append((int(m.group(1)), p))
    tagged.sort()
    if header:
        out.write(header)
    n = 0
    for _, p in tagged:
        with open(p) as f:
            for line in f:
                out.write(line)
                n += 1
    return n


def init_distributed() -> tuple[int, int]:
    """jax.distributed bring-up; returns (process_id, n_processes).

    Pod environments (TPU slices, SLURM) auto-detect via
    jax.distributed.initialize().  For manual/multi-node-over-TCP runs set
    JAX_COORDINATOR_ADDRESS=host:port, JAX_NUM_PROCESSES and
    JAX_PROCESS_ID on every process — the smoke test
    (tests/test_distributed.py) drives two local processes this way."""
    import jax
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        n = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if n is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=int(n),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
