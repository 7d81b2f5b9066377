"""On-hardware Pallas banded-SW parity harness (the compiled Mosaic path).

tests/test_pallas.py covers the kernel body under pallas INTERPRET mode on
the CPU suite; this harness re-runs the same parity matrix with the
Mosaic-COMPILED kernel on a real TPU, asserting bit-identity against the
XLA reference kernel (ops.bsw.bsw_kernel) — the claim cited by README
"Pallas extension kernel".  Run on a TPU host:

    python tools/pallas_parity_hw.py            # full matrix, asserts
    python tools/pallas_parity_hw.py --quick    # one rung per class

Behavioral spec: bandedSWA.cpp:116-237 (scalarBandedSWA == ksw_extend2);
outputs compared: (score, qle, tle, gtle, gscore, max_off) per pair.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

rng = np.random.default_rng(7)


def gen(P, Qmax, Tmax, h0max=120):
    """Same generator as tests/test_pallas.py: related q/t pairs with ~10%
    mutations, random lengths, padded with char 4."""
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


# (P, Qmax, Tmax, a, b, o_del, e_del, o_ins, e_ins, zdrop, end_bonus, h0cap)
FULL = [
    # production ladder rungs, default scoring
    (128, 127, 96, 1, 4, 6, 1, 6, 1, 100, 5, 256),
    (256, 127, 192, 1, 4, 6, 1, 6, 1, 100, 5, 256),
    (512, 255, 320, 1, 4, 6, 1, 6, 1, 100, 5, 256),
    (128, 255, 608, 1, 4, 6, 1, 6, 1, 100, 5, 256),
    # asymmetric gap costs, intractg-like scoring, -A scaling
    (128, 127, 96, 1, 9, 16, 1, 16, 1, 200, 5, 256),
    (128, 127, 192, 2, 8, 12, 2, 12, 2, 100, 10, 512),
    (128, 127, 96, 1, 4, 6, 1, 13, 4, 100, 5, 256),
    # zdrop off / tiny band stress
    (128, 127, 96, 1, 4, 6, 1, 6, 1, 0, 5, 256),
]
QUICK = FULL[:2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    assert not os.environ.get("BWAMEM2_TPU_PALLAS_INTERPRET"), \
        "unset BWAMEM2_TPU_PALLAS_INTERPRET: this harness tests the " \
        "COMPILED path"
    import jax
    from bwamem2_tpu.ops import bsw_pallas as bp
    from bwamem2_tpu.ops.bsw import bsw_kernel

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    assert bp.pallas_ok(), \
        "Mosaic-compiled Pallas unavailable on this backend (need a TPU)"

    configs = QUICK if args.quick else FULL
    for cfg in configs:
        (P, Qmax, Tmax, a, b, o_del, e_del, o_ins, e_ins, zdrop,
         end_bonus, h0cap) = cfg
        q, t, qlen, tlen, h0, w = gen(P, Qmax, Tmax, h0max=min(h0cap, 120))
        t0 = time.perf_counter()
        ref = np.asarray(bsw_kernel(
            q, t, qlen, tlen, h0, w, a, b, o_del, e_del, o_ins, e_ins,
            zdrop, end_bonus, max(a, 1), h0cap))
        t_xla = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = bp.bsw_pallas_from_rowmajor(
            q, t, qlen, tlen, h0, w, a, b, o_del, e_del, o_ins, e_ins,
            zdrop, end_bonus, max(a, 1), h0cap)
        t_pl = time.perf_counter() - t0
        same = (ref == got).all()
        print(f"P={P:4d} Q={Qmax:3d} T={Tmax:3d} a={a} b={b} "
              f"o/e={o_del}/{e_del},{o_ins}/{e_ins} z={zdrop} "
              f"eb={end_bonus} cap={h0cap}: "
              f"{'BIT-IDENTICAL' if same else 'MISMATCH'} "
              f"(xla {t_xla:.2f}s incl compile, pallas {t_pl:.2f}s)")
        if not same:
            bad = np.nonzero((ref != got).any(axis=1))[0][:5]
            for i in bad:
                print(f"  pair {i}: ref={ref[i]} got={got[i]}")
            sys.exit(1)
    print(f"all {len(configs)} configs bit-identical on the compiled "
          "Mosaic path")


if __name__ == "__main__":
    main()
