"""Pallas banded-SW kernel parity vs the XLA kernel (interpret mode).

The Mosaic-compiled path needs a real TPU; these tests run the same kernel
body under pallas interpret mode on the CPU suite so the DP logic (band
clamp/shrink, z-drop, rightmost-tie argmax, gscore, transposed layout,
early-exit block loop) stays covered.  The compiled path is additionally
verified bit-identical on hardware (README "Pallas extension kernel";
tools/pallas_parity_hw.py is the on-TPU harness).

Behavioral spec: bandedSWA.cpp:116-237 (scalarBandedSWA == ksw_extend2).
"""

import os

import numpy as np
import pytest

os.environ["BWAMEM2_TPU_PALLAS_INTERPRET"] = "1"

from bwamem2_tpu.ops.bsw import bsw_kernel  # noqa: E402
from bwamem2_tpu.ops import bsw_pallas as bp  # noqa: E402

rng = np.random.default_rng(7)


def gen(P, Qmax, Tmax, h0max=120):
    q = rng.integers(0, 4, (P, Qmax)).astype(np.int8)
    t = np.full((P, Tmax), 4, np.int8)
    qlen = rng.integers(1, Qmax + 1, P).astype(np.int32)
    tlen = rng.integers(1, Tmax + 1, P).astype(np.int32)
    for i in range(P):
        n = min(int(tlen[i]), int(qlen[i]))
        t[i, :n] = q[i, :n]
        nmut = max(1, n // 10)
        pos = rng.integers(0, n, nmut)
        t[i, pos] = rng.integers(0, 4, nmut)
        t[i, n:tlen[i]] = rng.integers(0, 4, int(tlen[i]) - n)
        q[i, qlen[i]:] = 4
    h0 = rng.integers(1, h0max, P).astype(np.int32)
    w = np.full(P, 100, np.int32)
    return q, t, qlen, tlen, h0, w


def _check(P, Qmax, Tmax, a, b, o_del, e_del, o_ins, e_ins, zdrop,
           end_bonus, h0cap):
    q, t, qlen, tlen, h0, w = gen(P, Qmax, Tmax, h0max=min(h0cap, 120))
    ref = np.asarray(bsw_kernel(
        q, t, qlen, tlen, h0, w, a, b, o_del, e_del, o_ins, e_ins,
        zdrop, end_bonus, max(a, 1), h0cap))
    got = bp.bsw_pallas_from_rowmajor(
        q, t, qlen, tlen, h0, w, a, b, o_del, e_del, o_ins, e_ins,
        zdrop, end_bonus, max(a, 1), h0cap)
    np.testing.assert_array_equal(ref, got)


def test_parity_default_scoring():
    # default params (a=1 b=4 o=6 e=1 zdrop=100), int16-tier problems,
    # on the smallest production ladder rung (Q=127, T=96)
    _check(128, 127, 96, 1, 4, 6, 1, 6, 1, 100, 5, 256)


def test_parity_zdrop_off_and_intractg():
    _check(128, 127, 96, 1, 4, 6, 1, 6, 1, 0, 5, 256)
    # intractg-like scoring through the int32 tier (huge h0cap)
    _check(128, 127, 96, 2, 9, 16, 1, 16, 1, 200, 5, 1 << 30)


@pytest.mark.skipif(not os.environ.get("BWAMEM2_TPU_SLOW_TESTS"),
                    reason="larger interpret-mode tiles (slow on CPU)")
def test_parity_ladder_shapes():
    _check(256, 255, 320, 1, 4, 6, 1, 6, 1, 100, 5, 256)
    _check(128, 255, 608, 1, 4, 6, 1, 6, 1, 100, 5, 1024)
