"""Fused on-device seed-and-extend step — the 'forward step' of the aligner.

One jittable function covering the three device stages end to end:
  1. round-1 SMEM backward walks over every (read, position) lane
  2. suffix-array resolution of each read's best (longest) SMEM
  3. banded-SW extension of that seed to the right against a reference
     window sliced from the doubled genome in HBM

This is what __graft_entry__.entry() compile-checks and what
dryrun_multichip shards over a `data` mesh axis (reads sharded, index
replicated).  The production pipeline calls the same kernels with host
orchestration between stages (ops/backend.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bsw import bsw_kernel
from .device_index import DeviceFMIndex
from .salookup import sa_lookup_kernel
from .smem import round1_kernel

REF_WIN = 256   # extension window on the reference
QER_WIN = 128


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def seed_extend_step(dfm: DeviceFMIndex, enc: jax.Array, lens: jax.Array,
                     a: int = 1, b: int = 4, o_del: int = 6, e_del: int = 1,
                     o_ins: int = 6, e_ins: int = 1, zdrop: int = 100):
    """enc: int32[N, L] nt4 codes; lens: int32[N].

    Returns (smem_b, smem_k, smem_s, coords, ext_scores):
      smem_*: per-(read, end-position) round-1 walk results
      coords: reference coordinate of each read's longest SMEM
      ext_scores: int32[N, 6] right-extension result of that seed."""
    N, L = enc.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]

    # stage 1: SMEM walks
    bcol, k, s = round1_kernel(dfm, enc, lens)
    length = jnp.where(pos < lens[:, None], pos - bcol + 1, 0)

    # best (longest) SMEM per read
    best_n = jnp.argmax(length, axis=1).astype(jnp.int32)
    take = lambda arr: jnp.take_along_axis(arr, best_n[:, None], axis=1)[:, 0]
    best_b = take(bcol)
    best_k = take(k)
    best_len = take(length)

    # stage 2: SA resolution of the first occurrence
    coords = sa_lookup_kernel(dfm, best_k)

    # stage 3: right extension from the seed end
    ref_len = dfm.ref.shape[0]
    qstart = jnp.minimum(best_n + 1, lens).astype(jnp.int32)
    qlen = jnp.maximum(lens - qstart, 0)
    rstart = jnp.clip(coords + best_len, 0, ref_len - 1)
    tlen = jnp.minimum(jnp.int64(REF_WIN), ref_len - rstart).astype(jnp.int32)

    def slice_q(e, st):
        return jax.lax.dynamic_slice(
            jnp.pad(e, (0, QER_WIN), constant_values=4), (st,), (QER_WIN,))

    def slice_r(st):
        return jax.lax.dynamic_slice(
            jnp.pad(dfm.ref.astype(jnp.int32), (0, REF_WIN),
                    constant_values=4), (st,), (REF_WIN,))

    qer = jax.vmap(slice_q)(enc, qstart)
    ref = jax.vmap(slice_r)(rstart.astype(jnp.int32))
    h0 = (best_len * a).astype(jnp.int32)
    w = jnp.full((N,), 100, jnp.int32)
    ext = bsw_kernel(qer, ref, qlen, tlen, h0, w, a, b,
                     o_del, e_del, o_ins, e_ins, zdrop, 5, a)
    return bcol, k, s, coords, ext
