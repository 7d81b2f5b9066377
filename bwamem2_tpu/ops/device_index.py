"""Device-resident FM-index and the batched LF-mapping primitives.

Layout (HBM):
  cp_count  int64[nblocks, 4]   checkpoint counts per 64-char BWT block
  oh_hi/lo  uint32[nblocks, 4]  one-hot BWT bitmasks split into two 32-bit
                                halves (bit 31 of `hi` = first char of block)
  counts    int64[5]            cumulative char counts (+1 sentinel shift)
  sa_ms/ls  int8/uint32         8x-compressed suffix array
  ref       uint8[2*l_pac]      doubled genome (the .0123 buffer)

The reference keeps CP_OCC as an array-of-structs of 64-byte blocks sized for
x86 cache lines (FMI_search.h:54-58); on TPU we split the struct into parallel
arrays so each occ() is two int32-indexed gathers + a popcount — the layout
XLA gathers handle best.  occ/backward-ext semantics mirror GET_OCC
(FMI_search.h:66-73) and backwardExt (FMI_search.cpp:1025-1052) exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceFMIndex:
    cp_count: jax.Array   # int64[nblocks, 4]
    oh_hi: jax.Array      # uint32[nblocks, 4]
    oh_lo: jax.Array      # uint32[nblocks, 4]
    counts: jax.Array     # int64[5]
    sa_ms: jax.Array      # int32[(n>>3)+1] (sign-extended from int8)
    sa_ls: jax.Array      # uint32[(n>>3)+1]
    sentinel: jax.Array   # int64 scalar
    ref: jax.Array        # uint8[2*l_pac]
    lut_k: jax.Array      # int64[4^K] K-mer interval starts (or size-1 dummy)
    lut_s: jax.Array      # int64[4^K] K-mer interval sizes

    def tree_flatten(self):
        return ((self.cp_count, self.oh_hi, self.oh_lo, self.counts,
                 self.sa_ms, self.sa_ls, self.sentinel, self.ref,
                 self.lut_k, self.lut_s), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_host(cls, fm: FMIndex, device=None,
                  lut: tuple | None = None) -> "DeviceFMIndex":
        oh = fm.one_hot
        oh_hi = (oh >> np.uint64(32)).astype(np.uint32)
        oh_lo = (oh & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        put = partial(jax.device_put, device=device)
        lut_k = lut[0] if lut else np.zeros(1, np.int64)
        lut_s = lut[1] if lut else np.zeros(1, np.int64)
        return cls(
            cp_count=put(fm.cp_count.astype(np.int64)),
            oh_hi=put(oh_hi),
            oh_lo=put(oh_lo),
            counts=put(fm.counts.astype(np.int64)),
            sa_ms=put(fm.sa_ms_byte.astype(np.int32)),
            sa_ls=put(fm.sa_ls_word.astype(np.uint32)),
            sentinel=put(jnp.int64(fm.sentinel_index)),
            ref=put(fm.ref_string),
            lut_k=put(lut_k.astype(np.int64)),
            lut_s=put(lut_s.astype(np.int64)),
        )


def _top_masks(y):
    """32-bit halves of the 64-bit 'top y bits' mask (one_hot_mask_array,
    FMI_search.cpp:386-394).  y: int32 array in [0, 64)."""
    y = y.astype(jnp.int32)
    yh = jnp.clip(y, 0, 32)
    yl = jnp.clip(y - 32, 0, 32)
    full = jnp.uint32(0xFFFFFFFF)
    # (full << (32 - y)) with y==0 -> 0, y==32 -> full, avoiding shift-by-32
    hi = jnp.where(yh == 0, jnp.uint32(0),
                   full << jnp.uint32(32 - jnp.clip(yh, 1, 32)))
    hi = jnp.where(yh == 32, full, hi)
    lo = jnp.where(yl == 0, jnp.uint32(0),
                   full << jnp.uint32(32 - jnp.clip(yl, 1, 32)))
    lo = jnp.where(yl == 32, full, lo)
    return hi, lo


def occ_one(dfm: DeviceFMIndex, pos, c):
    """occ(pos, c) for one char per lane: # of c in BWT[0:pos)."""
    blk = (pos >> 6).astype(jnp.int32)
    y = (pos & 63).astype(jnp.int32)
    mh, ml = _top_masks(y)
    base = dfm.cp_count[blk, c]
    h = jax.lax.population_count(dfm.oh_hi[blk, c] & mh).astype(jnp.int64)
    l = jax.lax.population_count(dfm.oh_lo[blk, c] & ml).astype(jnp.int64)
    return base + h + l


def occ_all4(dfm: DeviceFMIndex, pos):
    """occ(pos, c) for all 4 chars per lane -> (..., 4) int64."""
    blk = (pos >> 6).astype(jnp.int32)
    y = (pos & 63).astype(jnp.int32)
    mh, ml = _top_masks(y)
    base = dfm.cp_count[blk]                    # (..., 4)
    h = jax.lax.population_count(
        dfm.oh_hi[blk] & mh[..., None]).astype(jnp.int64)
    l = jax.lax.population_count(
        dfm.oh_lo[blk] & ml[..., None]).astype(jnp.int64)
    return base + h + l


def lf_step(dfm: DeviceFMIndex, k, s, a):
    """Backward extension by char a tracking only (k, s) — enough for
    SMEM enumeration and SA resolution (the RC-twin l is never consumed
    downstream of seeding)."""
    occ_sp = occ_one(dfm, k, a)
    occ_ep = occ_one(dfm, k + s, a)
    return dfm.counts[a] + occ_sp, occ_ep - occ_sp


def backward_ext_full(dfm: DeviceFMIndex, k, l, s, a):
    """Full bidirectional backward extension (backwardExt) including the
    RC-twin interval l and the sentinel correction; needed by forward
    extension (= backward ext on the RC index with k/l swapped)."""
    occ_sp = occ_all4(dfm, k)                    # (..., 4)
    occ_ep = occ_all4(dfm, k + s)
    kk = dfm.counts[:4] + occ_sp
    ss = occ_ep - occ_sp
    sent = ((k <= dfm.sentinel) & (dfm.sentinel < k + s)).astype(jnp.int64)
    l3 = l + sent
    l2 = l3 + ss[..., 3]
    l1 = l2 + ss[..., 2]
    l0 = l1 + ss[..., 1]
    ll = jnp.stack([l0, l1, l2, l3], axis=-1)
    a_idx = a[..., None].astype(jnp.int32)
    take = lambda arr: jnp.take_along_axis(arr, a_idx, axis=-1)[..., 0]
    return take(kk), take(ll), take(ss)


def bwt_char(dfm: DeviceFMIndex, pos):
    """BWT char at pos from the one-hot halves (4 = sentinel)."""
    blk = (pos >> 6).astype(jnp.int32)
    y = (pos & 63).astype(jnp.int32)          # 0 = first char of block
    bit = (63 - y).astype(jnp.uint32)          # bit index within uint64
    in_hi = bit >= 32
    sh = jnp.where(in_hi, bit - 32, bit).astype(jnp.uint32)
    hi = dfm.oh_hi[blk]                        # (..., 4)
    lo = dfm.oh_lo[blk]
    word = jnp.where(in_hi[..., None], hi, lo)
    bits = (word >> sh[..., None].astype(jnp.uint32)) & jnp.uint32(1)
    # first set bit wins; none set -> 4 (sentinel)
    c = jnp.argmax(bits, axis=-1).astype(jnp.int32)
    is_set = jnp.max(bits, axis=-1) > 0
    return jnp.where(is_set, c, jnp.int32(4))
