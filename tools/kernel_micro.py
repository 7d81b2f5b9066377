"""Per-kernel e2e microbenchmarks at bench-run shapes.

Times each production device kernel (warm) end to end — enqueue, execute,
fetch — on the live backend with the chr21-scale index, printing ms/call.
Used to attribute the pipeline's device-wait to kernels vs dispatch."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.options import MemOptions
from bwamem2_tpu.ops.device_index import DeviceFMIndex

P = ".tmp/bench_chr21/genome.fa"
fm = FMIndex.load(P)
opt = MemOptions().finalize()
dfm = DeviceFMIndex.from_host(fm)
rng = np.random.default_rng(7)


def t(f, reps=5):
    jax.device_get(f())
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(f())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


# --- seeding round 1: chain kernel, one lane/read, N=5120 L=152 ---
from bwamem2_tpu.ops.smem import (round1_chain_kernel, round2_backward_kernel,
                                  round2_forward_kernel, round3_replay_kernel)

N, L = 5120, 152
enc = jnp.asarray(rng.integers(0, 4, (N, L)).astype(np.int8))
lens = jnp.full((N,), 151, jnp.int32)
print(f"round1_chain  N={N} L={L}: "
      f"{t(lambda: round1_chain_kernel(dfm, enc, lens, 48)):8.2f} ms")

# --- round 2 forward/backward at observed pivot counts (~45k/chunk r1b) ---
NP2 = 11520
rid = jnp.asarray(rng.integers(0, N, NP2).astype(np.int32))
x = jnp.asarray(rng.integers(20, 100, NP2).astype(np.int32))
mi = jnp.ones((NP2,), jnp.int64)
print(f"round2_fwd    P={NP2}: "
      f"{t(lambda: round2_forward_kernel(dfm, enc, rid, x, mi, 24)):8.2f} ms")

# backward pass: every lane seeded from a real forward-candidate interval
cn, ck, cl, cs, ncand = round2_forward_kernel(dfm, enc, rid, x, mi, 24)
piv = jnp.asarray(np.arange(NP2, dtype=np.int32))
slot = jnp.zeros((NP2,), jnp.int32)
print(f"round2_bwd    M={NP2} (32-step lockstep phase): "
      f"{t(lambda: round2_backward_kernel(dfm, enc, rid, x, ck, cs, piv, slot, mi, 32)):8.2f} ms")

# round 3 replay (one lane per read, 2L+2 steps)
print(f"round3_replay N={N} L={L}: "
      f"{t(lambda: round3_replay_kernel(dfm, enc, lens, jnp.int64(20), jnp.int32(20), 8)):8.2f} ms")

# --- SA lookup at ~30k positions/chunk ---
from bwamem2_tpu.ops.salookup import sa_lookup_kernel

M = 32768
pos = jnp.asarray(rng.integers(0, 2*fm.l_pac, M).astype(np.int64))
print(f"sa_lookup     M={M}: "
      f"{t(lambda: sa_lookup_kernel(dfm, pos)):8.2f} ms")

# --- extension: pallas desc kernel at the dominant rungs ---
from bwamem2_tpu.ops.bsw_pallas import bsw_desc_pallas, pallas_ok

print("pallas_ok:", pallas_ok())
encf = enc
for (PP, Q, T) in [(512, 127, 96), (512, 255, 320), (1024, 127, 96)]:
    qoff = jnp.asarray(rng.integers(0, N * L - 200, PP).astype(np.int32))
    qdir = jnp.ones((PP,), jnp.int32)
    qlen = jnp.full((PP,), min(Q, 120), jnp.int32)
    toff = jnp.asarray(rng.integers(0, fm.l_pac, PP).astype(np.int64))
    tdir = jnp.ones((PP,), jnp.int32)
    tlen = jnp.full((PP,), min(T, 150), jnp.int32)
    h0 = jnp.full((PP,), 30, jnp.int32)
    w = jnp.full((PP,), opt.w, jnp.int32)
    f = lambda: bsw_desc_pallas(dfm.ref, encf, qoff, qdir, qlen, toff, tdir,
                                tlen, h0, w, Q, T, opt.a, opt.b, opt.o_del,
                                opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop,
                                opt.pen_clip5, max(opt.a, 1),
                                dfm.ref_packed)
    print(f"bsw_pallas    P={PP} Q={Q} T={T}: {t(f):8.2f} ms")

# --- kswv u8 at rescue shapes ---
from bwamem2_tpu.ops.kswv import kswv_kernel

for (PP, Q, T) in [(512, 160, 512), (512, 160, 1024)]:
    qoff = jnp.asarray(rng.integers(0, N * L - 200, PP).astype(np.int32))
    qdir = jnp.ones((PP,), jnp.int32)
    qcomp = jnp.zeros((PP,), bool)
    qlen = jnp.full((PP,), 151, jnp.int32)
    toff = jnp.asarray(rng.integers(0, fm.l_pac, PP).astype(np.int64))
    tlen = jnp.full((PP,), min(T, 500), jnp.int32)
    endsc = jnp.full((PP,), 1 << 16, jnp.int32)
    do = jnp.ones((PP,), bool)
    ones = jnp.ones((PP,), jnp.int32)
    f = lambda: kswv_kernel(dfm.ref, encf, qoff, qdir, qcomp, qlen, toff,
                            ones, tlen, endsc, do, Q, T,
                            opt.min_seed_len * opt.a, opt.a, opt.b,
                            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                            dfm.ref_packed, True)
    print(f"kswv_u8       P={PP} Q={Q} T={T}: {t(f):8.2f} ms")
