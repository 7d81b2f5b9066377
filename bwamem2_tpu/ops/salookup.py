"""Batched suffix-array resolution on device.

Each lane LF-walks from a BWT position until it reaches a sampled SA slot
(pos & 7 == 0) or the sentinel, then adds the walk length — the vectorized
equivalent of get_sa_entry_compressed / get_sa_entries_prefetch
(FMI_search.cpp:1103-1175, 1257-1375).  The reference hides the gather
latency with 20-deep software pipelining and prefetch; on TPU all lanes
issue their gathers at once and HBM bandwidth does the rest.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .device_index import DeviceFMIndex, _fetch_rows, bwt_char_occ, take_counts


@partial(jax.jit, static_argnums=())
def sa_lookup_kernel(dfm: DeviceFMIndex, pos: jax.Array) -> jax.Array:
    """Resolve BWT positions (int64[M]) to reference coordinates."""
    offset = jnp.zeros_like(pos)
    done = (pos & 7) == 0
    sp = pos
    hit_sentinel = jnp.zeros(pos.shape, bool)

    def step_fn(st):
        done, sp, offset, hit_sentinel = st
        # fused (char, occ) from ONE packed-row gather per lane-step
        b, occ = bwt_char_occ(dfm, sp)
        sent = ~done & (b == 4)
        hit_sentinel = hit_sentinel | sent
        bc = jnp.where(b == 4, 0, b).astype(jnp.int32)
        sp2 = take_counts(dfm.counts, bc) + occ
        step = ~done & ~sent
        sp = jnp.where(step, sp2, sp)
        offset = jnp.where(step, offset + 1, offset)
        done = done | sent | (step & ((sp & 7) == 0))
        return done, sp, offset, hit_sentinel

    # Walk length is ~Geometric(1/8) (unbounded worst case), so a plain
    # while_loop would sync device->host every step; instead take 16 masked
    # steps per convergence check — one check usually suffices.
    def body16(st):
        for _ in range(16):
            st = step_fn(st)
        return st

    if dfm.shard_axis is None:
        cond = lambda st: jnp.any(~st[0])
    else:
        # under shard_map every device must take the same trip count (the
        # loop body contains collectives): reduce the liveness globally
        cond = lambda st: jax.lax.psum(
            jnp.any(~st[0]).astype(jnp.int32), dfm.shard_axis) > 0

    done, sp, offset, hit_sentinel = jax.lax.while_loop(
        cond, body16, (done, sp, offset, hit_sentinel))
    idx = (sp >> 3).astype(jnp.int32)
    sa = (_fetch_rows(dfm, dfm.sa_ms, idx).astype(jnp.int64) << 32) \
        + _fetch_rows(dfm, dfm.sa_ls, idx).astype(jnp.int64)
    return jnp.where(hit_sentinel, offset, sa + offset)
