"""Pallas banded-SW extension tile (the SURVEY §7.1 showpiece).

Same DP semantics as ops/bsw.py's _bsw_dp (behavioral spec:
bandedSWA.cpp:116-237 == ksw_extend2), re-expressed as a Mosaic kernel so
the loop-carried DP grids live in VMEM instead of round-tripping HBM every
row.  XLA keeps a fori_loop's carry in HBM once it exceeds register budget:
at (P=512, Q=256) int16 the H/E grids are ~0.5MB, so every DP row pays
~1.5MB of HBM traffic under XLA — the Pallas kernel's only HBM traffic is
the one-time q/t tile load.

TPU-native layout choice: the DP column axis is the SUBLANE axis and pairs
are the 128 VPU lanes — transposed from the XLA kernel's (P, Q).  Every
per-row primitive then maps onto cheap hardware ops:
  * per-row target char t[i]         -> (1, PB) sublane-dim dynamic slice
  * the F prefix-max scan (cummax)   -> log2(Q) sublane rolls + max
  * the H carry shift by one column  -> one sublane roll + row-0 fixup
  * row max / argmax / band shrink   -> cross-sublane reduces
  * all per-lane scalar state        -> (1, PB) rows, broadcast for free
Row blocks of 16 run inside a while_loop whose condition is "any lane still
alive", so tiles whose lanes z-drop early (or whose tlen is far below the
shape-ladder rung) skip the dead rows entirely — the early-exit the
reference gets from its scalar [beg, end) loop bounds.

Outputs are bit-identical to ops/bsw.bsw_kernel (tested, both interpret
and compiled); the band clamp (bandedSWA.cpp:147-156) is computed in the
XLA wrapper because it divides in f64.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
PB = 128           # pairs per program instance = VPU lane count
ROW_BLOCK = 16     # rows per early-exit check


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _roll_down1(x, row0):
    """Shift +1 along the sublane (column) axis: out[j] = x[j-1],
    out[0] = row0 ((1, PB))."""
    r = pltpu.roll(x, 1, 0)
    rows = jax.lax.broadcasted_iota(I32, x.shape, 0)
    return jnp.where(rows == 0, row0.astype(x.dtype), r)


def _cummax_sub(x, QP: int):
    """Inclusive cummax along the sublane axis (Hillis-Steele scan:
    log2(QP) rolls); wrapped rows are masked to the identity (the scan
    input's out-of-band rows are already NEG)."""
    rows = jax.lax.broadcasted_iota(I32, x.shape, 0)
    sh = 1
    while sh < QP:
        r = pltpu.roll(x, sh, 0)
        x = jnp.where(rows >= sh, jnp.maximum(x, r), x)
        sh <<= 1
    return x


def _mk_kernel(Qmax: int, QP: int, Tmax: int, mat_a: int, mat_b: int,
               o_del: int, e_del: int, o_ins: int, e_ins: int,
               zdrop: int, end_bonus: int, dt):
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    NEG = -16384 if dt == jnp.int16 else -(1 << 30)
    n_blocks = (Tmax + ROW_BLOCK - 1) // ROW_BLOCK

    def kernel(q_ref, t_ref, qlen_ref, tlen_ref, h0_ref, w_ref, out_ref):
        qcols = q_ref[...]                       # (QP, PB) int32, col Q.. = 4
        qlen = qlen_ref[...]                     # (1, PB) int32
        tlen = tlen_ref[...]
        h0 = h0_ref[...]
        w = w_ref[...]                           # pre-clamped band width
        cols = jax.lax.broadcasted_iota(I32, (QP, PB), 0)
        colsN = cols.astype(dt)

        # first DP row (bandedSWA.cpp:139-146): H[0]=h0,
        # H[j]=max(h0-oe_ins-(j-1)e_ins, 0), zero beyond qlen
        tj = h0 - oe_ins - (cols - 1) * e_ins
        H = jnp.where(cols == 0, h0, jnp.maximum(tj, 0))
        H = jnp.where(cols <= qlen, H, 0).astype(dt)
        E = jnp.zeros((QP, PB), dt)

        mx = h0
        max_i = jnp.full((1, PB), -1, I32)
        max_j = jnp.full((1, PB), -1, I32)
        max_ie = jnp.full((1, PB), -1, I32)
        gscore = jnp.full((1, PB), -1, I32)
        max_off = jnp.zeros((1, PB), I32)
        beg = jnp.zeros((1, PB), I32)
        end = qlen
        done = (tlen <= 0).astype(I32)   # int32 mask: bool
        # loop carries materialize as i8 vectors Mosaic cannot
        # truncate back to i1

        def row_body(i, st):
            (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg, end,
             done_i) = st
            done = done_i != 0
            act_row = ~done & (i < tlen)
            beg_r = jnp.maximum(beg, i - w)
            end_r = jnp.minimum(jnp.minimum(end, i + w + 1), qlen)
            ti = t_ref[pl.ds(jnp.minimum(i, Tmax - 1), 1), :]   # (1, PB)
            h1_0 = jnp.where(beg_r == 0,
                             jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0),
                             0)

            band = (cols >= beg_r) & (cols < end_r)
            s_ij = jnp.where((ti >= 4) | (qcols >= 4), jnp.asarray(-1, dt),
                             jnp.where(ti == qcols, jnp.asarray(mat_a, dt),
                                       jnp.asarray(-mat_b, dt)))
            Mv = jnp.where(H != 0, H + s_ij, 0).astype(dt)
            u = jnp.where(band,
                          jnp.maximum(Mv - oe_ins, 0).astype(dt)
                          + colsN * e_ins, jnp.asarray(NEG, dt))
            upre = _roll_down1(_cummax_sub(u, QP),
                               jnp.full((1, PB), NEG, dt))
            fv = upre - jnp.maximum(colsN - 1, 0) * e_ins
            hv = jnp.maximum(jnp.maximum(Mv, E), fv)
            hv = jnp.where(band, hv, 0).astype(dt)
            # reduce in int32 (Mosaic lacks sub-32-bit reductions)
            m = jnp.max(hv.astype(I32), axis=0, keepdims=True)   # (1, PB)
            is_max = band & (hv == m.astype(dt))
            mj = jnp.max(jnp.where(is_max, cols, -1), axis=0,
                         keepdims=True)
            mj = jnp.where(act_row & (m > 0), mj, -1)
            carry = _roll_down1(jnp.where(band, hv, 0), h1_0)
            carry = jnp.where(cols == beg_r, h1_0.astype(dt), carry)
            h1_end = jnp.sum(
                jnp.where((cols == end_r - 1) & (end_r > beg_r),
                          hv.astype(I32), 0), axis=0, keepdims=True,
                dtype=I32)
            h1_end = jnp.where(end_r > beg_r, h1_end, h1_0)
            wr = act_row & band
            H = jnp.where(wr, carry, H)
            E = jnp.where(wr, jnp.maximum(E - e_del,
                                          jnp.maximum(Mv - oe_del, 0)),
                          E).astype(dt)

            at_end = act_row & (cols == end_r)
            H = jnp.where(at_end, h1_end.astype(dt), H)
            E = jnp.where(at_end, 0, E).astype(dt)

            full = act_row & (end_r == qlen)
            max_ie = jnp.where(full & (gscore <= h1_end), i, max_ie)
            gscore = jnp.where(full, jnp.maximum(gscore, h1_end), gscore)
            m = jnp.where(act_row, m, 0)
            mj = jnp.where(act_row, mj, -1)

            newly_done = act_row & (m == 0)
            upd = act_row & (m > mx)
            off = jnp.abs(mj - i)
            max_off = jnp.where(upd, jnp.maximum(max_off, off), max_off)
            mx2 = jnp.where(upd, m, mx)
            max_i = jnp.where(upd, i, max_i)
            max_j = jnp.where(upd, mj, max_j)
            if zdrop > 0:
                # logical combine, not select-on-bool (Mosaic materializes
                # bool select operands as i8 and cannot truncate back)
                del_case = (i - max_i) > (mj - max_j)
                zd_d = mx - m - ((i - max_i) - (mj - max_j)) * e_del > zdrop
                zd_i = mx - m - ((mj - max_j) - (i - max_i)) * e_ins > zdrop
                zd = (del_case & zd_d) | (~del_case & zd_i)
                newly_done = newly_done | (act_row & ~upd & ~(m == 0) & zd)
            mx = mx2

            # band shrink to the nonzero region (bandedSWA.cpp:218-221)
            nz = (H != 0) | (E != 0)
            inA = band & nz
            first = jnp.min(jnp.where(inA, cols, Qmax + 2), axis=0,
                            keepdims=True)
            beg_n = jnp.minimum(first, end_r)
            inB = (cols >= beg_r) & (cols <= end_r) & nz
            last = jnp.max(jnp.where(inB, cols, beg_r - 1), axis=0,
                           keepdims=True)
            end_n = jnp.minimum(last + 2, qlen)

            keep = act_row & ~newly_done
            beg = jnp.where(keep, beg_n, beg_r)
            end = jnp.where(keep, end_n, end_r)
            done_i = jnp.where(done | newly_done, 1, 0)
            return (H, E, mx, max_i, max_j, max_ie, gscore, max_off, beg,
                    end, done_i)

        def blk_body(st):
            blk = st[0]

            def inner(r, s):
                return row_body(blk * ROW_BLOCK + r, s)

            return (blk + 1,) + jax.lax.fori_loop(0, ROW_BLOCK, inner,
                                                  st[1:])

        def blk_cond(st):
            # reduce-any as an int32 max: jnp.any's Mosaic proxy lowering
            # casts through the default float dtype (f64 under x64), which
            # the scalar squeeze rejects
            n_alive = jnp.max(1 - st[-1])
            return (st[0] < n_blocks) & (n_alive > 0)

        st = (jnp.int32(0), H, E, mx, max_i, max_j, max_ie, gscore,
              max_off, beg, end, done)
        st = jax.lax.while_loop(blk_cond, blk_body, st)
        (_, _, _, mx, max_i, max_j, max_ie, gscore, max_off, _, _, _) = st
        out_ref[0, :] = mx[0, :]
        out_ref[1, :] = max_j[0, :] + 1
        out_ref[2, :] = max_i[0, :] + 1
        out_ref[3, :] = max_ie[0, :] + 1
        out_ref[4, :] = gscore[0, :]
        out_ref[5, :] = max_off[0, :]

    return kernel


@partial(jax.jit,
         static_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15))
def bsw_pallas(qT, tT, qlen, tlen, h0, w_in,
               mat_a: int, mat_b: int, o_del: int, e_del: int,
               o_ins: int, e_ins: int, zdrop: int, end_bonus: int,
               max_sc: int, h0cap: int = 1 << 30):
    """Banded SW extension over TRANSPOSED sequence tiles.

    qT: int32[QP, P] query codes (QP = Qmax+1 rounded up to 32, rows past
    the query padded with 4), tT: int32[Tmax, P]; per-lane int32[P] scalars.
    Returns int32[P, 6]: score qle tle gtle gscore max_off — bit-identical
    to ops.bsw.bsw_kernel."""
    QP, P = qT.shape
    Tmax = tT.shape[0]
    Qmax = QP - 1   # by construction of the wrapper; band never reaches pad
    assert P % PB == 0
    # Mosaic gap on this toolchain: dynamic_rotate and reductions only
    # support 32-bit element types, so the VMEM-resident grids are int32
    # (the XLA kernel's int16 tier exists to cut HBM loop-state traffic,
    # which a VMEM-resident kernel does not pay in the first place)
    del h0cap
    dt = I32

    # band clamp in f64 (bandedSWA.cpp:147-156) — outside the kernel
    max_ins = jnp.floor((qlen * max_sc + end_bonus - o_ins) / e_ins + 1.0) \
        .astype(I32)
    max_del = jnp.floor((qlen * max_sc + end_bonus - o_del) / e_del + 1.0) \
        .astype(I32)
    w = jnp.minimum(w_in, jnp.maximum(max_ins, 1))
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    kernel = _mk_kernel(Qmax, QP, Tmax, mat_a, mat_b, o_del, e_del,
                        o_ins, e_ins, zdrop, end_bonus, dt)
    row = lambda a: a.astype(I32).reshape(1, P)
    grid = (P // PB,)
    # trace the kernel with x64 OFF: the package enables x64 globally (FM
    # coordinates), which makes python literals weak-i64 scalars — Mosaic
    # cannot lower i64 and its i64->i32 demotion recurses.  Everything in
    # this kernel is int32/int16 by construction.
    from jax._src.config import enable_x64
    with enable_x64(False):
        out = _call(kernel, grid, QP, Tmax, P, qT, tT, row(qlen),
                    row(tlen), row(h0), row(w))
    return out.T


def _call(kernel, grid, QP, Tmax, P, qT, tT, qlen, tlen, h0, w):
    import os
    out = pl.pallas_call(
        kernel,
        # interpret mode runs the kernel logic on CPU (slow; the parity
        # tests use it so the suite's virtual-CPU mesh still covers it)
        interpret=bool(os.environ.get("BWAMEM2_TPU_PALLAS_INTERPRET")),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QP, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tmax, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB), lambda p: (0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, PB), lambda p: (0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, P), I32),
    )(qT.astype(I32), tT.astype(I32), qlen, tlen, h0, w)
    return out


@partial(jax.jit,
         static_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21))
def bsw_desc_pallas(ref, enc, qoff, qdir, qlen, toff, tdir, tlen, h0, w_in,
                    Qmax: int, Tmax: int, mat_a: int, mat_b: int,
                    o_del: int, e_del: int, o_ins: int, e_ins: int,
                    zdrop: int, end_bonus: int, max_sc: int,
                    ref_packed: bool = False):
    """Descriptor-driven Pallas extension (the production entry).

    Same descriptor contract as ops.bsw.bsw_desc_kernel — sequences are
    gathered on device from the resident doubled genome and the chunk's
    padded read grid — but the tiles are built directly in the kernel's
    TRANSPOSED layout (DP columns = sublanes, pairs = lanes), so the only
    host->device traffic is ~40 bytes/pair of descriptors."""
    N, L = enc.shape
    enc_flat = enc.reshape(-1).astype(I32)
    QP = _round_up(Qmax + 1, 32)
    jidx = jnp.arange(QP, dtype=I32)[:, None]            # (QP, 1)
    qpos = qoff[None, :] + qdir[None, :] * jidx          # (QP, P)
    qT = jnp.where(jidx < qlen[None, :],
                   enc_flat[jnp.clip(qpos, 0, N * L - 1)], 4)
    from .device_index import take_ref
    iidx = jnp.arange(Tmax, dtype=jnp.int64)[:, None]
    tpos = toff[None, :] + tdir[None, :].astype(jnp.int64) * iidx
    tT = jnp.where(iidx < tlen[None, :], take_ref(ref, tpos, ref_packed), 4)
    return bsw_pallas(qT, tT, qlen, tlen, h0, w_in, mat_a, mat_b,
                      o_del, e_del, o_ins, e_ins, zdrop, end_bonus, max_sc)


_PALLAS_OK: bool | None = None


def pallas_ok() -> bool:
    """True iff Mosaic-compiled kernels run on the active backend.

    Probed once with a tiny tile (cached): the CPU backend (tests, virtual
    meshes) has no Mosaic target, and gating by probe rather than platform
    string keeps the axon-tunneled TPU working.  Override with
    BWAMEM2_TPU_PALLAS=0/1."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        import os
        env = os.environ.get("BWAMEM2_TPU_PALLAS")
        if env is not None:
            _PALLAS_OK = env not in ("0", "false", "")
        elif jax.default_backend() == "cpu":
            _PALLAS_OK = False
        else:
            try:
                q = np.zeros((4, 8), np.int8)
                t = np.zeros((4, 8), np.int8)
                one = np.ones(4, np.int32)
                bsw_pallas_from_rowmajor(q, t, one, one, one, one * 100,
                                         1, 4, 6, 1, 6, 1, 100, 5, 1)
                _PALLAS_OK = True
            except Exception:  # pragma: no cover - backend-dependent
                _PALLAS_OK = False
    return _PALLAS_OK


def bsw_pallas_from_rowmajor(q, t, qlen, tlen, h0, w_in, mat_a, mat_b,
                             o_del, e_del, o_ins, e_ins, zdrop, end_bonus,
                             max_sc, h0cap: int = 1 << 30):
    """Convenience wrapper taking the (P, Qmax)/(P, Tmax) row-major tiles
    of ops.bsw.bsw_kernel (test rig interop): appends the qcols pad column,
    pads QP to a sublane multiple, and transposes."""
    P, Qmax = q.shape
    QP = _round_up(Qmax + 1, 32)
    qc = np.full((P, QP), 4, np.int32)
    qc[:, :Qmax] = np.asarray(q, np.int32)
    Pp = _round_up(P, PB)
    if Pp != P:
        qc = np.concatenate([qc, np.full((Pp - P, QP), 4, np.int32)])
        t = np.concatenate([np.asarray(t, np.int32),
                            np.full((Pp - P, t.shape[1]), 4, np.int32)])
        pad = lambda a: np.concatenate([np.asarray(a, np.int32),
                                        np.zeros(Pp - P, np.int32)])
        qlen, tlen, h0, w_in = map(pad, (qlen, tlen, h0, w_in))
    out = bsw_pallas(jnp.asarray(np.ascontiguousarray(qc.T)),
                     jnp.asarray(np.ascontiguousarray(
                         np.asarray(t, np.int32).T)),
                     jnp.asarray(qlen), jnp.asarray(tlen),
                     jnp.asarray(h0), jnp.asarray(w_in),
                     mat_a, mat_b, o_del, e_del, o_ins, e_ins, zdrop,
                     end_bonus, max_sc, h0cap)
    return np.asarray(out)[:P]
