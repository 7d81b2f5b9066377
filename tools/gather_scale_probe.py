"""Measure XLA gather throughput vs table size on the live backend.

The round-2 scale cliff (chr21 ~1790 r/s, 240Mbp ~20-80 r/s, 3.1Gbp ~2 r/s)
tracks occ-table size, not genome algorithmics.  This probe isolates the
gather primitive: for a table of int32[nblocks, 16] rows (the occ4 layout)
measure
  (a) one-shot batched gather of P random rows
  (b) a 16-step dependent gather chain inside one jit (the LF-walk shape)
at table sizes from 4MB to a configurable cap, printing rows/s per size.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 32768
STEPS = 16
sizes_mb = [int(x) for x in (sys.argv[1:] or
                             ["4", "16", "64", "256", "1024", "2048", "4096"])]


@jax.jit
def one_shot(tab, idx):
    return tab[idx].sum(dtype=jnp.int32)


@jax.jit
def chain(tab, idx):
    n = tab.shape[0]

    def body(i, st):
        ix, acc = st
        rows = tab[ix]
        acc = acc + rows.sum(axis=1, dtype=jnp.int32)
        ix = (ix * 1103515245 + rows[:, 0] + 12345) % n
        return ix, acc

    ix, acc = jax.lax.fori_loop(0, STEPS, body, (idx, jnp.zeros_like(idx)))
    return acc.sum()


def bench(f, tab, idx, reps=3):
    jax.device_get(f(tab, idx))          # compile + warm
    best = 1e30
    for _ in range(reps):
        t = time.time()
        jax.device_get(f(tab, idx))
        best = min(best, time.time() - t)
    return best


print(f"backend={jax.default_backend()} P={P} steps={STEPS}", flush=True)
for mb in sizes_mb:
    nblocks = mb * (1 << 20) // 64
    key = np.random.default_rng(1)
    tab = jax.device_put(
        np.arange(nblocks * 16, dtype=np.int32).reshape(nblocks, 16) & 0xFFFF)
    idx = jax.device_put(
        key.integers(0, nblocks, P).astype(np.int32))
    t1 = bench(one_shot, tab, idx)
    tc = bench(chain, tab, idx)
    print(f"size={mb:5d}MB nblocks={nblocks:>10}  "
          f"one_shot={P/t1/1e6:8.1f} Mrow/s ({t1*1e3:7.2f} ms)  "
          f"chain={P*STEPS/tc/1e6:8.1f} Mrow/s ({tc*1e3:7.2f} ms)",
          flush=True)
    del tab, idx
