"""Device-resident FM-index and the batched LF-mapping primitives.

Layout (HBM):
  occp      int32[nblocks, 8]  one 32-byte row per 64-char BWT block:
                               [cp_lo[4] | code[4]]
                               cp_lo    = low 32 bits of the 4 checkpoint
                                          counts (GET_OCC base)
                               code[4]  = the block's 64 BWT chars as 2-bit
                                          codes, 16 per uint32, LSB-first
  occ_hi    int32[nblocks]     the counts' bits 32.. , one byte per base
                               packed into one lane — identically zero for
                               any genome whose doubled length fits uint32,
                               in which case it is a dummy and NEVER
                               gathered (static `has_hi` flag)
  counts    int64[5]           cumulative char counts (+1 sentinel shift)
  sa_ms/ls  int32/uint32       8x-compressed suffix array
  ref       uint8[2*l_pac]     doubled genome (the .0123 buffer)

The reference keeps CP_OCC as 64-byte array-of-structs blocks sized for x86
cache lines: 4 int64 counts + 4 uint64 one-hot masks per 64 chars, 1 byte
per indexed char (FMI_search.h:54-58).  The TPU reformulation packs the
same information into a 32-byte row — 0.5 bytes/char — by storing the BWT
chars as 2-bit codes instead of 4 one-hot planes and deriving per-base
membership masks arithmetically (3 VPU ops + popcount per 16-char word vs
1 popcount, a trade that is pure win on a machine whose occ() cost is HBM
gather rows, not ALU).  Each occ() query is still ONE row gather; the table
is 2-4x smaller than the round-2 split layout (occ4+occ1), which both
shrinks the random-gather working set and makes a human-scale (3.1 Gbp)
index fit one chip's HBM with room for kernel working sets.

The row width is a measured choice: XLA:TPU row gathers of width 8 run ~3x
faster per step than width 9 (tools/gather_scale_probe.py on v5e), so the
rarely-nonzero high count bytes live in their own int32[nblocks] plane,
gathered only for genomes whose counts can exceed 32 bits (> ~2 Gbp) —
every kernel on human-or-smaller genomes pays exactly one 8-word gather
per occ().

occ/backward-ext semantics mirror GET_OCC (FMI_search.h:66-73) and
backwardExt (FMI_search.cpp:1025-1052) exactly, including 64-bit counts.
The sentinel's block slot stores code 0 (its one-hot planes are all zero in
the reference layout); occ() subtracts the phantom 'A' when the sentinel
falls inside the counted prefix — checkpoint counts are exact by
construction, so the correction is purely in-block.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex

# 16-bit -> 32-bit "reverse and spread" table: bit (15-t) of the input (the
# one-hot convention puts the block's first char at the TOP bit,
# FMI_search.cpp:218-252) lands at bit 2t of the output (codes are
# LSB-first so char extraction is a plain shift by 2*(j&15)).
_SPREAD16: np.ndarray | None = None


def _spread16() -> np.ndarray:
    global _SPREAD16
    if _SPREAD16 is None:
        v = np.arange(1 << 16, dtype=np.uint32)
        out = np.zeros(1 << 16, np.uint32)
        for t in range(16):
            out |= ((v >> (15 - t)) & 1) << (2 * t)
        _SPREAD16 = out
    return _SPREAD16


def pack_occ_rows(cp_count: np.ndarray,
                  one_hot: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side build of the packed occ table from the index file's
    checkpoint layout (cp_count int64[nb,4], one_hot uint64[nb,4]).
    Returns (occp int32[nb,8], occ_hi int32[nb])."""
    nb = cp_count.shape[0]
    occp = np.zeros((nb, 8), np.int32)
    occp[:, 0:4] = (cp_count & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    hi = (cp_count >> 32).astype(np.int32)   # < 256 for any genome < 2^40
    occ_hi = (hi[:, 0] | (hi[:, 1] << 8) | (hi[:, 2] << 16)
              | (hi[:, 3] << 24)).astype(np.int32)
    spread = _spread16()
    # code planes: lo bit set for chars 1,3; hi bit for chars 2,3
    lo64 = one_hot[:, 1] | one_hot[:, 3]
    hi64 = one_hot[:, 2] | one_hot[:, 3]
    for wi in range(4):
        sh = np.uint64(48 - 16 * wi)
        sub_lo = ((lo64 >> sh) & np.uint64(0xFFFF)).astype(np.uint16)
        sub_hi = ((hi64 >> sh) & np.uint64(0xFFFF)).astype(np.uint16)
        occp[:, 4 + wi] = (spread[sub_lo]
                           | (spread[sub_hi] << 1)).view(np.int32)
    return occp, occ_hi


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceFMIndex:
    occp: jax.Array       # int32[nblocks, 8] packed block rows (see above)
    occ_hi: jax.Array     # int32[nblocks] packed count-hi bytes (or dummy)
    counts: jax.Array     # int64[5]
    sa_ms: jax.Array      # int8[(n>>3)+1] (sign-extends at use)
    sa_ls: jax.Array      # uint32[(n>>3)+1]
    sentinel: jax.Array   # int64 scalar
    ref: jax.Array        # uint8[2*l_pac], or 2-bit packed (ref_packed)
    lut_k: jax.Array      # int64[4^K] K-mer interval starts (or size-1 dummy)
    lut_s: jax.Array      # int64[4^K] K-mer interval sizes
    ref_packed: bool = False   # static: 4 chars/byte (human-scale HBM)
    has_hi: bool = False       # static: occ counts can exceed 32 bits
    # genome-bucket index sharding (SURVEY §5.8): when set, occp/sa_ms/sa_ls
    # hold only the LOCAL row shard (contiguous blocks, axis-index order)
    # and every row fetch is the distributed gather in _dist_rows.  Code
    # using a sharded index must run inside shard_map over this axis.
    shard_axis: str | None = None

    # int32 interval arithmetic (occ_one32 / lf_step32) is exact when the
    # doubled genome fits int32
    SMALL_MAX_PAC = 1 << 30
    # pack the doubled genome 4 chars/byte above this (2*l_pac): at human
    # scale the u8 ref alone is 6.2GB; packed it is 1.55GB and the whole
    # index fits a 16GB v5e with room for working sets
    REF_PACK_MIN = 1 << 31

    def tree_flatten(self):
        return ((self.occp, self.occ_hi, self.counts, self.sa_ms,
                 self.sa_ls, self.sentinel, self.ref, self.lut_k,
                 self.lut_s),
                (self.ref_packed, self.has_hi, self.shard_axis))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, ref_packed=aux[0], has_hi=aux[1],
                   shard_axis=aux[2])

    @classmethod
    def from_host(cls, fm: FMIndex, device=None,
                  lut: tuple | None = None) -> "DeviceFMIndex":
        """device=None: default device; device="host": keep numpy leaves
        (staging for parallel.shard_index, which device_puts each table
        straight into its mesh layout — big tables never land whole on
        one chip)."""
        occp, occ_hi = pack_occ_rows(fm.cp_count.astype(np.int64),
                                     fm.one_hot)
        has_hi = bool(occ_hi.any())
        if not has_hi:
            occ_hi = np.zeros(1, np.int32)
        if device == "host":
            put = lambda x: np.asarray(x)  # noqa: E731
        else:
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
            occp=put(occp),
            occ_hi=put(occ_hi),
            counts=put(fm.counts.astype(np.int64)),
            sa_ms=put(fm.sa_ms_byte.astype(np.int8)),
            sa_ls=put(fm.sa_ls_word.astype(np.uint32)),
            sentinel=put(jnp.int64(fm.sentinel_index)),
            ref=put(ref),
            lut_k=put(lut_k.astype(np.int64)),
            lut_s=put(lut_s.astype(np.int64)),
            ref_packed=ref_packed,
            has_hi=has_hi,
        )


def take_counts(counts, a, base: int = 0):
    """counts[a + base] for per-lane a in [0, 4) without a gather (4-way
    select on the scalar entries — XLA gathers cost ~100x a select)."""
    return jnp.where(a == 0, counts[base],
                     jnp.where(a == 1, counts[base + 1],
                               jnp.where(a == 2, counts[base + 2],
                                         counts[base + 3])))


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


def _dist_rows_fused(tab_a, tab_b, idx, axis: str):
    """One-collective-round variant of _dist_rows for TWO equally-sharded
    tables queried at the SAME row ids (occp + occ_hi on a >2Gbp sharded
    index): a single all_gather of the ids, both local gathers, and ONE
    psum_scatter over the concatenated rows — halving the ICI rounds per
    LF step vs two separate _dist_rows calls.  tab_b is 1-D (per-row
    scalar); returns (rows_a [..., W], rows_b [...])."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    nloc = tab_a.shape[0]
    W = tab_a.shape[-1]
    shape = idx.shape
    ids = idx.reshape(-1)
    n = ids.shape[0]
    ids_all = jax.lax.all_gather(ids, axis)              # (D, n)
    loc = ids_all - jnp.asarray(me * nloc, ids_all.dtype)
    inr = (loc >= 0) & (loc < nloc)
    safe = jnp.clip(loc, 0, nloc - 1)
    rows_a = jnp.where(inr[..., None], tab_a[safe], 0)
    rows_b = jnp.where(inr, tab_b[safe], 0)
    cat = jnp.concatenate([rows_a, rows_b[..., None]], axis=-1)
    out = jax.lax.psum_scatter(cat.reshape(D * n, W + 1), axis,
                               scatter_dimension=0, tiled=True)
    out = out.reshape(*shape, W + 1)
    return out[..., :W], out[..., W]


def _fetch_rows(dfm: DeviceFMIndex, tab, idx):
    """Row gather honoring the index's sharding mode."""
    if dfm.shard_axis is None:
        return tab[idx]
    return _dist_rows(tab, idx, dfm.shard_axis)


def _row(dfm: DeviceFMIndex, pos):
    """Fetch the packed block row for each position: ONE gather (plus the
    hi-count plane when the genome needs it — fused into the same
    collective round on a sharded index).
    Returns (row int32[..., 8], y int32, blk int32, hi int32[...] | None)."""
    blk = (pos >> 6).astype(jnp.int32)
    y = (pos & 63).astype(jnp.int32)
    if not dfm.has_hi:
        return _fetch_rows(dfm, dfm.occp, blk), y, blk, None
    if dfm.shard_axis is not None:
        row, hi = _dist_rows_fused(dfm.occp, dfm.occ_hi, blk,
                                   dfm.shard_axis)
        return row, y, blk, hi
    # replicated: two independent gathers (XLA drops the hi gather when a
    # caller never consumes it, e.g. occ_one32 on small genomes)
    return (_fetch_rows(dfm, dfm.occp, blk), y, blk,
            _fetch_rows(dfm, dfm.occ_hi, blk))


_W_OFFS = np.arange(4, dtype=np.int32) * 16   # code-word start offsets


def _prefix_masks(y):
    """Per code word, the mask covering the first clip(y - 16*wi, 0, 16)
    chars (bits [0, 2*nfull)).  y: int32[...] -> uint32[..., 4]."""
    nfull = jnp.clip(y[..., None] - _W_OFFS, 0, 16)
    full = jnp.uint32(0xFFFFFFFF)
    m = full >> (jnp.uint32(32) - (nfull.astype(jnp.uint32) << 1))
    return jnp.where(nfull == 0, jnp.uint32(0), m)


def _match_c(words, c):
    """Per code word, even-bit mask of chars equal to per-lane c.
    words: uint32[..., 4], c: int32[...] -> uint32[..., 4]."""
    pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))[..., None]
    m = words ^ pat
    return ~(m | (m >> 1)) & jnp.uint32(0x55555555)


def _inblock_count(words, y, c):
    """# of chars equal to c among the block's first y chars.  int32."""
    z = _match_c(words, c) & _prefix_masks(y)
    return jax.lax.population_count(z).sum(axis=-1).astype(jnp.int32)


def _sent_corr(dfm: DeviceFMIndex, pos, y, c):
    """1 where the sentinel slot (stored as code 0) falls inside the
    counted prefix [block_start, pos) and c == 0, else 0.  int32."""
    sent = dfm.sentinel
    return ((c == 0) & ((pos - y.astype(pos.dtype)) <= sent)
            & (sent < pos)).astype(jnp.int32)


def _cp64(dfm: DeviceFMIndex, hirow, row, c):
    """Per-lane 64-bit checkpoint count for base c from a packed row.
    The high bytes live in their own plane (see module docstring), fetched
    alongside the row by _row only when the genome is big enough for them
    to be nonzero (hirow is None otherwise)."""
    lo = _u32(_sel4(row[..., 0:4], c)).astype(jnp.int64)
    if hirow is None:
        return lo
    hi = (hirow >> (c << 3)) & 0xFF
    return lo + (hi.astype(jnp.int64) << 32)


def _sel4(v, c):
    """v[..., c] for per-lane c in [0, 4) without a gather."""
    return jnp.where(c == 0, v[..., 0],
                     jnp.where(c == 1, v[..., 1],
                               jnp.where(c == 2, v[..., 2], v[..., 3])))


def occ_one(dfm: DeviceFMIndex, pos, c):
    """occ(pos, c) for one char per lane: # of c in BWT[0:pos).
    One 32-byte row gather + 4 word popcounts (GET_OCC equivalent)."""
    row, y, _, hirow = _row(dfm, pos)
    words = _u32(row[..., 4:8])
    n = _inblock_count(words, y, c) - _sent_corr(dfm, pos, y, c)
    return _cp64(dfm, hirow, row, c) + n.astype(jnp.int64)


def occ_one32(dfm: DeviceFMIndex, pos, c):
    """int32 occ(pos, c) for genomes whose doubled length fits int32:
    the cp high byte is identically zero, so the count is the low int32
    lane + in-block popcounts — same gather, half the loop-state width for
    callers that carry (k, s) through long walks."""
    row, y, _, _ = _row(dfm, pos)
    words = _u32(row[..., 4:8])
    n = _inblock_count(words, y, c) - _sent_corr(dfm, pos, y, c)
    return _sel4(row[..., 0:4], c) + n


def lf_step32(dfm: DeviceFMIndex, counts32, k, s, a):
    """lf_step with int32 interval arithmetic (see occ_one32); counts32 is
    dfm.counts pre-cast by the caller."""
    occ_sp = occ_one32(dfm, k, a)
    occ_ep = occ_one32(dfm, k + s, a)
    return take_counts(counts32, a) + occ_sp, occ_ep - occ_sp


def occ_all4(dfm: DeviceFMIndex, pos):
    """occ(pos, c) for all 4 chars per lane -> (..., 4) int64.  One gather."""
    row, y, _, hirow = _row(dfm, pos)
    words = _u32(row[..., 4:8])                      # (..., 4)
    pmask = _prefix_masks(y)                         # (..., 4)
    lo = words & jnp.uint32(0x55555555)              # plane: code bit 0
    hi = (words >> 1) & jnp.uint32(0x55555555)       # plane: code bit 1
    ones = jnp.uint32(0x55555555)
    n = []
    for c in range(4):
        zlo = lo if (c & 1) else lo ^ ones
        zhi = hi if (c & 2) else hi ^ ones
        z = zlo & zhi & pmask
        n.append(jax.lax.population_count(z).sum(axis=-1))
    n = jnp.stack(n, axis=-1).astype(jnp.int64)      # (..., 4)
    sent = dfm.sentinel
    corr = (((pos - y.astype(pos.dtype)) <= sent)
            & (sent < pos)).astype(jnp.int64)
    n = n.at[..., 0].add(-corr)                      # phantom 'A' at sentinel
    lo4 = _u32(row[..., 0:4]).astype(jnp.int64)
    if hirow is None:
        return lo4 + n
    hi4 = ((hirow[..., None] >> (jnp.arange(4, dtype=jnp.int32) << 3))
           & 0xFF).astype(jnp.int64) << 32
    return lo4 + hi4 + n


def occ_all4_32(dfm: DeviceFMIndex, pos):
    """int32 occ(pos, c) for all 4 chars (occ_all4 for genomes whose
    doubled length fits int32: the cp high bytes are identically zero, so
    the low checkpoint lanes + in-block popcounts are the full count)."""
    row, y, _, _ = _row(dfm, pos)
    words = _u32(row[..., 4:8])
    pmask = _prefix_masks(y)
    lo = words & jnp.uint32(0x55555555)
    hi = (words >> 1) & jnp.uint32(0x55555555)
    ones = jnp.uint32(0x55555555)
    n = []
    for c in range(4):
        zlo = lo if (c & 1) else lo ^ ones
        zhi = hi if (c & 2) else hi ^ ones
        z = zlo & zhi & pmask
        n.append(jax.lax.population_count(z).sum(axis=-1))
    n = jnp.stack(n, axis=-1).astype(jnp.int32)
    sent = dfm.sentinel.astype(jnp.int32)
    corr = (((pos - y) <= sent) & (sent < pos)).astype(jnp.int32)
    n = n.at[..., 0].add(-corr)
    return row[..., 0:4] + n


def backward_ext_full32(dfm: DeviceFMIndex, counts32, k, l, s, a):
    """backward_ext_full with int32 interval arithmetic (small genomes);
    counts32 is dfm.counts pre-cast by the caller."""
    occ_sp = occ_all4_32(dfm, k)
    occ_ep = occ_all4_32(dfm, k + s)
    kk = counts32[:4] + occ_sp
    ss = occ_ep - occ_sp
    sent32 = dfm.sentinel.astype(jnp.int32)
    sent = ((k <= sent32) & (sent32 < k + s)).astype(jnp.int32)
    l3 = l + sent
    l2 = l3 + ss[..., 3]
    l1 = l2 + ss[..., 2]
    l0 = l1 + ss[..., 1]
    a32 = a.astype(jnp.int32)
    take_l = jnp.where(a32 == 0, l0,
                       jnp.where(a32 == 1, l1,
                                 jnp.where(a32 == 2, l2, l3)))
    return _sel4(kk, a32), take_l, _sel4(ss, a32)


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
    the fused LF-walk step of SA resolution.  With stored codes the char is
    a direct 2-bit extract; only the sentinel slot needs the identity
    check (its slot stores code 0)."""
    row, y, _, hirow = _row(dfm, pos)
    words = _u32(row[..., 4:8])
    word = _sel4(words, y >> 4)
    code = ((word >> ((y & 15).astype(jnp.uint32) << 1)) & 3) \
        .astype(jnp.int32)
    is_sent = pos == dfm.sentinel
    c = jnp.where(is_sent, jnp.int32(4), code)
    n = _inblock_count(words, y, code) - _sent_corr(dfm, pos, y, code)
    occ = _cp64(dfm, hirow, row, code) + n.astype(jnp.int64)
    return c, occ


def bwt_char(dfm: DeviceFMIndex, pos):
    """BWT char at pos from the stored codes (4 = sentinel)."""
    row, y, _, _ = _row(dfm, pos)
    word = _sel4(_u32(row[..., 4:8]), y >> 4)
    code = ((word >> ((y & 15).astype(jnp.uint32) << 1)) & 3) \
        .astype(jnp.int32)
    return jnp.where(pos == dfm.sentinel, jnp.int32(4), code)


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
