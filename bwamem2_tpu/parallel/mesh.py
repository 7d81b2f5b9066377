"""Multi-chip / multi-host scaling.

The aligner is data-parallel over reads (SURVEY.md §2.6, §5.8): the FM-index
arrays are replicated on every device, read batches are sharded over a 1-D
`data` mesh axis, and the per-lane kernels need no cross-device collectives —
matching the reference's embarrassingly-parallel deployment (per-node FASTQ
shards; kthread work-stealing inside a node).  Determinism comes from
chunk-indexed output ordering, not from communication.

For multi-host pods: `jax.distributed.initialize()` per host, each host
feeds its own FASTQ shard through its local devices, and SAM chunks are
written per-host and concatenated in chunk order (merge_shards)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, enc: np.ndarray, lens: np.ndarray,
                axis: str = "data"):
    """Pad the read batch to a multiple of the mesh size and shard it."""
    n_dev = mesh.devices.size
    N = enc.shape[0]
    pad = (-N) % n_dev
    if pad:
        enc = np.concatenate([enc, np.full((pad, enc.shape[1]), 4,
                                           enc.dtype)])
        lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(enc, sh), jax.device_put(lens, sh), N


def replicate_index(mesh: Mesh, dfm):
    """Replicate the FM-index arrays on every device of the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), dfm)


def sharded_seed_extend(mesh: Mesh, dfm, enc, lens):
    """The full device step under data sharding: XLA partitions every
    per-lane kernel along the read axis with zero collectives."""
    from ..ops.entry import seed_extend_step
    dfm_r = replicate_index(mesh, dfm)
    encs, lenss, n = shard_batch(mesh, np.asarray(enc), np.asarray(lens))
    out = seed_extend_step(dfm_r, encs, lenss)
    return [np.asarray(o)[:n] for o in out]


def merge_shards(chunks: dict[int, str]) -> str:
    """Deterministic SAM merge: concatenate per-chunk outputs by index."""
    return "".join(chunks[i] for i in sorted(chunks))
