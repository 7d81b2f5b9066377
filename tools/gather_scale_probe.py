"""Measure XLA gather throughput vs table size on the live backend.

The round-2 scale cliff (chr21 ~1790 r/s, 240Mbp ~20-80 r/s, 3.1Gbp ~2 r/s)
tracks occ-table size, not genome algorithmics.  This probe isolates the
gather primitive: for a table of int32[nblocks, 16] rows (the occ4 layout)
measure
  (a) one-shot batched gather of P random rows
  (b) a 16-step dependent gather chain inside one jit (the LF-walk shape)
  (c) the same gather through a Pallas per-row DMA kernel (table stays in
      HBM, K in-flight async copies) — true random access, cost independent
      of table size
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


def pallas_gather(tab, idx, B=2048, K=8):
    """out[i] = tab[idx[i]] via per-row async DMA (HBM -> VMEM)."""
    from functools import partial

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = idx.shape[0]
    W = tab.shape[1]
    assert N % B == 0

    def kernel(idx_sm, tab_hbm, out_vm, sem):
        pid = pl.program_id(0)

        def mk(i, slot):
            return pltpu.make_async_copy(
                tab_hbm.at[idx_sm[pid * B + i]], out_vm.at[i],
                sem.at[slot])

        def body(i, _):
            slot = jax.lax.rem(i, K)

            @pl.when(i >= K)
            def _():
                pltpu.make_async_copy(
                    tab_hbm.at[idx_sm[pid * B + i - K]],
                    out_vm.at[i - K], sem.at[slot]).wait()

            mk(i, slot).start()
            return 0

        jax.lax.fori_loop(0, B, body, 0)

        def drain(i, _):
            pltpu.make_async_copy(
                tab_hbm.at[idx_sm[pid * B + B - K + i]],
                out_vm.at[B - K + i], sem.at[jax.lax.rem(B - K + i, K)]) \
                .wait()
            return 0

        jax.lax.fori_loop(0, K, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((B, W), lambda p, *_: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, W), tab.dtype),
    )(idx, tab)


@jax.jit
def one_shot_pallas(tab, idx):
    return pallas_gather(tab, idx).sum(dtype=jnp.int32)


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
    try:
        tp = bench(one_shot_pallas, tab, idx)
        pal = f"pallas={P/tp/1e6:8.1f} Mrow/s ({tp*1e3:7.2f} ms)"
    except Exception as e:  # CPU backend: no Mosaic
        pal = f"pallas=n/a ({type(e).__name__})"
    print(f"size={mb:5d}MB nblocks={nblocks:>10}  "
          f"one_shot={P/t1/1e6:8.1f} Mrow/s ({t1*1e3:7.2f} ms)  "
          f"chain={P*STEPS/tc/1e6:8.1f} Mrow/s ({tc*1e3:7.2f} ms)  "
          f"{pal}", flush=True)
    del tab, idx
