"""Genome-bucket FM-index sharding across a device mesh (SURVEY §5.8).

The replicated deployment (parallel/mesh.py) needs every chip to hold the
whole index; at human scale (3.1 Gbp, doubled genome 6.2 G chars) the
packed occ table is 6.2G/64 blocks x 32 B = 3.1 GB and the compressed SA
(6.2G/8 entries x 5 B) 3.9 GB — together with the 1.55 GB packed reference
they crowd a 16 GB v5e once kernel working sets are added.  This module
shards the big tables by CONTIGUOUS ROW RANGE ("genome bucket") over a
mesh axis:

  occp   int32[nblocks, 8]   -> rows split across devices (axis order)
  occ_hi int32[nblocks]      -> same (>2 Gbp genomes; dummy otherwise)
  sa_ms  int8 [(n>>3)+1]     -> same
  sa_ls  uint32[(n>>3)+1]    -> same
  counts / sentinel / ref / lut stay replicated (ref is 2-bit packed at
  this scale: 1.55 GB; see DeviceFMIndex.REF_PACK_MIN).

Per-chip HBM at 3.1 Gbp: replicated = 3.1 + 3.9 + 1.55 ≈ 8.6 GB;
sharded over 4 chips = (3.1 + 3.9)/4 + 1.55 ≈ 3.3 GB.

Every row fetch inside the kernels becomes the distributed gather
`ops.device_index._dist_rows` (all_gather ids → local gather → psum_scatter
rows; occp + occ_hi ride ONE fused collective round via _dist_rows_fused),
so kernels run unmodified inside `jax.shard_map` with reads sharded over
the same axis — lookups cost one ICI round per LF step in exchange for
the capacity.  The reference has no equivalent (single shared-memory
CP_OCC, FMI_search.h:54-58); this is the TPU-native answer to its "one
socket sees the whole table" assumption.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.device_index import DeviceFMIndex


def _pad_rows(a: np.ndarray, d: int) -> np.ndarray:
    pad = (-a.shape[0]) % d
    if pad == 0:
        return a
    return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])


def shard_index(mesh: Mesh, dfm: DeviceFMIndex,
                axis: str = "data") -> DeviceFMIndex:
    """Re-lay a (host or device) DeviceFMIndex with occp/sa_ms/sa_ls
    sharded along `axis` and everything else replicated.  The result's
    kernels must run inside shard_map over the same mesh axis."""
    d = mesh.shape[axis]
    row_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put_sharded(x):
        return jax.device_put(_pad_rows(np.asarray(x), d), row_sh)

    return DeviceFMIndex(
        occp=put_sharded(dfm.occp),
        occ_hi=(put_sharded(dfm.occ_hi) if dfm.has_hi
                else jax.device_put(np.asarray(dfm.occ_hi), rep)),
        counts=jax.device_put(np.asarray(dfm.counts), rep),
        sa_ms=put_sharded(dfm.sa_ms),
        sa_ls=put_sharded(dfm.sa_ls),
        sentinel=jax.device_put(np.asarray(dfm.sentinel), rep),
        ref=jax.device_put(np.asarray(dfm.ref), rep),
        lut_k=jax.device_put(np.asarray(dfm.lut_k), rep),
        lut_s=jax.device_put(np.asarray(dfm.lut_s), rep),
        ref_packed=dfm.ref_packed,
        has_hi=dfm.has_hi,
        shard_axis=axis,
    )


def index_specs(dfm: DeviceFMIndex, axis: str = "data") -> DeviceFMIndex:
    """The PartitionSpec pytree matching shard_index's layout (for
    shard_map in_specs)."""
    return DeviceFMIndex(
        occp=P(axis), occ_hi=P(axis) if dfm.has_hi else P(),
        counts=P(), sa_ms=P(axis), sa_ls=P(axis),
        sentinel=P(), ref=P(), lut_k=P(), lut_s=P(),
        ref_packed=dfm.ref_packed, has_hi=dfm.has_hi, shard_axis=axis)


def sharded_kernel(mesh: Mesh, kernel, dfm_spec: DeviceFMIndex,
                   n_read_args: int, axis: str = "data", out_specs=None):
    """Wrap `kernel(dfm, *read_arrays, ...)` in shard_map: index sharded
    per dfm_spec, the first n_read_args arrays sharded along their leading
    (read/lane) dim, outputs sharded the same way by default."""
    in_specs = (dfm_spec,) + (P(axis),) * n_read_args
    if out_specs is None:
        out_specs = P(axis)
    return jax.shard_map(kernel, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def sharded_seed_extend_sharded_index(mesh: Mesh, dfm: DeviceFMIndex,
                                      enc, lens, axis: str = "data"):
    """seed_extend_step with BOTH reads and index sharded over `axis` —
    the full §5.8 deployment shape.  Returns host arrays trimmed to the
    true batch size; output is bit-identical to the replicated-index path
    (asserted by dryrun_multichip and tests/test_shard_index.py)."""
    from ..ops.entry import seed_extend_step
    from .mesh import shard_batch
    sdfm = shard_index(mesh, dfm, axis)
    encs, lenss, n = shard_batch(mesh, np.asarray(enc), np.asarray(lens),
                                 axis)
    fn = sharded_kernel(mesh, seed_extend_step, index_specs(sdfm, axis), 2,
                        axis)
    out = fn(sdfm, encs, lenss)
    return [np.asarray(o)[:n] for o in out]
