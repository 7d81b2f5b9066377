"""Device-resident FM-index and the batched LF-mapping primitives.

Layout (HBM):
  occ4      int32[nblocks, 16]  one 64-byte row per 64-char BWT block:
                                [cp_lo[4] | cp_hi[4] | oh_hi[4] | oh_lo[4]]
                                (checkpoint counts split into 32-bit halves,
                                one-hot BWT bitmask halves, per base)
  counts    int64[5]            cumulative char counts (+1 sentinel shift)
  sa_ms/ls  int32/uint32        8x-compressed suffix array
  ref       uint8[2*l_pac]      doubled genome (the .0123 buffer)

The reference keeps CP_OCC as an array-of-structs of 64-byte blocks sized for
x86 cache lines (FMI_search.h:54-58).  The TPU twist: XLA lowers a gather to
~the same cost per ROW whether the row is 1 or 16 int32s (measured ~330M
rows/s at width 4-16 vs ~130M at width 1 on v5e), so the entire block —
counts and bitmasks for all 4 bases — is packed into ONE 16-lane int32 row
and each occ() query is a single gather + vector popcounts.  occ/backward-ext
semantics mirror GET_OCC (FMI_search.h:66-73) and backwardExt
(FMI_search.cpp:1025-1052) exactly, including 64-bit counts (carried as two
int32 halves so the layout also serves >2^31-bp genomes).
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
    occ4: jax.Array       # int32[nblocks, 16]
    occ1: jax.Array       # int32[nblocks*4, 4] per-(block,char) rows
    #                       [cp_lo, cp_hi, oh_hi, oh_lo] — a narrower gather
    #                       for the single-char hot path; built only for
    #                       genomes < OCC1_MAX_PAC bp (doubles table memory)
    counts: jax.Array     # int64[5]
    sa_ms: jax.Array      # int8[(n>>3)+1] (sign-extends at use)
    sa_ls: jax.Array      # uint32[(n>>3)+1]
    sentinel: jax.Array   # int64 scalar
    ref: jax.Array        # uint8[2*l_pac], or 2-bit packed (ref_packed)
    lut_k: jax.Array      # int64[4^K] K-mer interval starts (or size-1 dummy)
    lut_s: jax.Array      # int64[4^K] K-mer interval sizes
    ref_packed: bool = False   # static: 4 chars/byte (human-scale HBM)
    # genome-bucket index sharding (SURVEY §5.8): when set, occ4/sa_ms/sa_ls
    # hold only the LOCAL row shard (contiguous blocks, axis-index order)
    # and every row fetch is the distributed gather in _dist_rows.  Code
    # using a sharded index must run inside shard_map over this axis.
    shard_axis: str | None = None

    OCC1_MAX_PAC = 1 << 30
    # pack the doubled genome 4 chars/byte above this (2*l_pac): at human
    # scale the u8 ref alone is 6.2GB; packed it is 1.55GB and the whole
    # index fits a 16GB v5e with room for working sets
    REF_PACK_MIN = 1 << 31

    def tree_flatten(self):
        return ((self.occ4, self.occ1, self.counts, self.sa_ms, self.sa_ls,
                 self.sentinel, self.ref, self.lut_k, self.lut_s),
                (self.ref_packed, self.shard_axis))

    @classmethod
    def tree_unflatten(cls, aux, children):
        if not isinstance(aux, tuple):   # pre-sharding pytrees
            aux = (aux, None)
        return cls(*children, ref_packed=aux[0], shard_axis=aux[1])

    @classmethod
    def from_host(cls, fm: FMIndex, device=None,
                  lut: tuple | None = None) -> "DeviceFMIndex":
        cp = fm.cp_count.astype(np.int64)
        oh = fm.one_hot
        cp_lo = (cp & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        cp_hi = (cp >> 32).astype(np.int32)
        oh_hi = (oh >> np.uint64(32)).astype(np.uint32).view(np.int32)
        oh_lo = (oh & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        occ4 = np.concatenate([cp_lo, cp_hi, oh_hi, oh_lo], axis=1)
        if fm.l_pac < cls.OCC1_MAX_PAC:
            occ1 = np.stack([cp_lo, cp_hi, oh_hi, oh_lo],
                            axis=2).reshape(-1, 4)
        else:
            occ1 = np.zeros((1, 4), np.int32)
        put = partial(jax.device_put, device=device)
        lut_k = lut[0] if lut else np.zeros(1, np.int64)
        lut_s = lut[1] if lut else np.zeros(1, np.int64)
        ref = np.ascontiguousarray(fm.ref_string, np.uint8)
        ref_packed = ref.shape[0] >= cls.REF_PACK_MIN
        if ref_packed:
            pad = (-ref.shape[0]) % 4
            if pad:
                ref = np.concatenate([ref, np.zeros(pad, np.uint8)])
            r = ref.reshape(-1, 4)
            ref = (r[:, 0] | (r[:, 1] << 2) | (r[:, 2] << 4)
                   | (r[:, 3] << 6)).astype(np.uint8)
        return cls(
            occ4=put(occ4),
            occ1=put(occ1),
            counts=put(fm.counts.astype(np.int64)),
            sa_ms=put(fm.sa_ms_byte.astype(np.int8)),
            sa_ls=put(fm.sa_ls_word.astype(np.uint32)),
            sentinel=put(jnp.int64(fm.sentinel_index)),
            ref=put(ref),
            lut_k=put(lut_k.astype(np.int64)),
            lut_s=put(lut_s.astype(np.int64)),
            ref_packed=ref_packed,
        )


def take_counts(counts, a, base: int = 0):
    """counts[a + base] for per-lane a in [0, 4) without a gather (4-way
    select on the scalar entries — XLA gathers cost ~100x a select)."""
    return jnp.where(a == 0, counts[base],
                     jnp.where(a == 1, counts[base + 1],
                               jnp.where(a == 2, counts[base + 2],
                                         counts[base + 3])))


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


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _dist_rows(tab, idx, axis: str):
    """Distributed row gather for a dim-0-sharded table (genome-bucket
    index sharding, SURVEY §5.8; the TPU-native stand-in for the
    reference's single shared-memory CP_OCC, FMI_search.h:54-58).

    `tab` is the LOCAL shard — contiguous rows, split across the mesh
    `axis` in axis-index order.  `idx` holds GLOBAL row ids (same shape and
    meaning on every device: each device queries for its own lanes).  One
    all_gather of the ids, one local gather (ids outside the local range
    contribute 0 — exactly one shard owns each id), one psum_scatter to
    route every row back to the asking device.  Collectives ride ICI; the
    per-device gather work is D× the replicated case over 1/D the table —
    a capacity trade, used when the index cannot fit one chip's HBM."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    nloc = tab.shape[0]
    shape = idx.shape
    ids = idx.reshape(-1)
    n = ids.shape[0]
    ids_all = jax.lax.all_gather(ids, axis)              # (D, n)
    loc = ids_all - jnp.asarray(me * nloc, ids_all.dtype)
    inr = (loc >= 0) & (loc < nloc)
    safe = jnp.clip(loc, 0, nloc - 1)
    if tab.ndim > 1:
        W = tab.shape[-1]
        rows = jnp.where(inr[..., None], tab[safe], 0)
        out = jax.lax.psum_scatter(rows.reshape(D * n, W), axis,
                                   scatter_dimension=0, tiled=True)
        return out.reshape(*shape, W)
    rows = jnp.where(inr, tab[safe], 0)
    out = jax.lax.psum_scatter(rows.reshape(D * n), axis,
                               scatter_dimension=0, tiled=True)
    return out.reshape(shape)


def _fetch_rows(dfm: DeviceFMIndex, tab, idx):
    """Row gather honoring the index's sharding mode."""
    if dfm.shard_axis is None:
        return tab[idx]
    return _dist_rows(tab, idx, dfm.shard_axis)


def _row(dfm: DeviceFMIndex, pos):
    """Fetch the packed 16-lane block row for each position: ONE gather.
    Returns (cp int64[...,4], hi uint32[...,4], lo uint32[...,4], y)."""
    blk = (pos >> 6).astype(jnp.int32)
    y = (pos & 63).astype(jnp.int32)
    row = _fetch_rows(dfm, dfm.occ4, blk)        # (..., 16)
    cp = (_u32(row[..., 0:4]).astype(jnp.int64)
          + (row[..., 4:8].astype(jnp.int64) << 32))
    return cp, _u32(row[..., 8:12]), _u32(row[..., 12:16]), y


def _sel4(v, c):
    """v[..., c] for per-lane c in [0, 4) without a gather."""
    return jnp.where(c == 0, v[..., 0],
                     jnp.where(c == 1, v[..., 1],
                               jnp.where(c == 2, v[..., 2], v[..., 3])))


def occ_one(dfm: DeviceFMIndex, pos, c):
    """occ(pos, c) for one char per lane: # of c in BWT[0:pos).

    Small genomes keep a per-(block,char) table so this is one 16-byte row
    gather + two popcounts (W=4 gathers are ~15% faster than W=16 and move
    4x fewer bytes); otherwise one 64-byte block row gather + selects.
    Sharded indexes always take the occ4 path (occ1 is a small-genome-only
    duplicate; sharding exists for genomes where it is never built)."""
    if dfm.occ1.shape[0] > 1 and dfm.shard_axis is None:
        blk = (pos >> 6).astype(jnp.int32)
        y = (pos & 63).astype(jnp.int32)
        row = dfm.occ1[(blk << 2) + c]
        cp = (_u32(row[..., 0]).astype(jnp.int64)
              + (row[..., 1].astype(jnp.int64) << 32))
        mh, ml = _top_masks(y)
        h = jax.lax.population_count(_u32(row[..., 2]) & mh)
        l = jax.lax.population_count(_u32(row[..., 3]) & ml)
        return cp + h.astype(jnp.int64) + l.astype(jnp.int64)
    cp, hi, lo, y = _row(dfm, pos)
    mh, ml = _top_masks(y)
    base = _sel4(cp, c)
    h = jax.lax.population_count(_sel4(hi, c) & mh).astype(jnp.int64)
    l = jax.lax.population_count(_sel4(lo, c) & ml).astype(jnp.int64)
    return base + h + l


def occ_one32(dfm: DeviceFMIndex, pos, c):
    """int32 occ(pos, c) for genomes whose doubled length fits int32:
    the cp_hi limb is identically zero, so the count is the low int32 word
    + popcounts — same gather, half the loop-state width for callers that
    carry (k, s) through long walks."""
    blk = (pos >> 6)
    y = (pos & 63)
    row = dfm.occ1[(blk << 2) + c]
    mh, ml = _top_masks(y)
    h = jax.lax.population_count(_u32(row[..., 2]) & mh).astype(jnp.int32)
    l = jax.lax.population_count(_u32(row[..., 3]) & ml).astype(jnp.int32)
    return row[..., 0] + h + l


def lf_step32(dfm: DeviceFMIndex, counts32, k, s, a):
    """lf_step with int32 interval arithmetic (see occ_one32); counts32 is
    dfm.counts pre-cast by the caller."""
    occ_sp = occ_one32(dfm, k, a)
    occ_ep = occ_one32(dfm, k + s, a)
    return take_counts(counts32, a) + occ_sp, occ_ep - occ_sp


def occ_all4(dfm: DeviceFMIndex, pos):
    """occ(pos, c) for all 4 chars per lane -> (..., 4) int64.  One gather."""
    cp, hi, lo, y = _row(dfm, pos)
    mh, ml = _top_masks(y)
    h = jax.lax.population_count(hi & mh[..., None]).astype(jnp.int64)
    l = jax.lax.population_count(lo & ml[..., None]).astype(jnp.int64)
    return cp + h + l


def lf_step(dfm: DeviceFMIndex, k, s, a):
    """Backward extension by char a tracking only (k, s) — enough for
    SMEM enumeration and SA resolution (the RC-twin l is never consumed
    downstream of seeding).  Two row gathers."""
    occ_sp = occ_one(dfm, k, a)
    occ_ep = occ_one(dfm, k + s, a)
    return take_counts(dfm.counts, a) + occ_sp, occ_ep - occ_sp


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
    a32 = a.astype(jnp.int32)
    take_l = jnp.where(a32 == 0, l0,
                       jnp.where(a32 == 1, l1,
                                 jnp.where(a32 == 2, l2, l3)))
    return _sel4(kk, a32), take_l, _sel4(ss, a32)


def bwt_char_occ(dfm: DeviceFMIndex, pos):
    """(BWT char at pos (4 = sentinel), occ(pos, that char)) in ONE gather —
    the fused LF-walk step of SA resolution."""
    cp, hi, lo, y = _row(dfm, pos)
    in_hi = y < 32
    sh = jnp.where(in_hi, 31 - y, 63 - y).astype(jnp.uint32)
    word = jnp.where(in_hi[..., None], hi, lo)
    bits = (word >> sh[..., None]) & jnp.uint32(1)
    c = jnp.argmax(bits, axis=-1).astype(jnp.int32)
    is_set = jnp.max(bits, axis=-1) > 0
    c = jnp.where(is_set, c, jnp.int32(4))
    cc = jnp.where(is_set, c, 0)
    mh, ml = _top_masks(y)
    occ = (_sel4(cp, cc)
           + jax.lax.population_count(_sel4(hi, cc) & mh).astype(jnp.int64)
           + jax.lax.population_count(_sel4(lo, cc) & ml).astype(jnp.int64))
    return c, occ


def bwt_char(dfm: DeviceFMIndex, pos):
    """BWT char at pos from the one-hot halves (4 = sentinel)."""
    return bwt_char_occ(dfm, pos)[0]


def take_ref(ref, pos, packed: bool):
    """Doubled-genome char at pos (int32 in [0,4)); `packed` is static.

    Out-of-range positions are clipped (unpacked) or wrap within the last
    byte (packed) — callers mask those lanes, only in-range values are
    consumed."""
    if not packed:
        return ref[jnp.clip(pos, 0, ref.shape[0] - 1)].astype(jnp.int32)
    b = ref[jnp.clip((pos >> 2).astype(jnp.int64), 0,
                     ref.shape[0] - 1)].astype(jnp.int32)
    return (b >> ((pos.astype(jnp.int32) & 3) * 2)) & 3
