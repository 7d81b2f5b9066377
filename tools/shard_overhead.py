"""Measure the genome-bucket index-sharding overhead (SURVEY §5.8).

Times the two transports for the SAME row fetches on the virtual 8-device
CPU mesh (conftest-style):

  * replicated:  occ_all4 / sa_lookup with local gathers
  * sharded:     the same kernels inside shard_map, every row fetch an
                 all_gather(ids) + local gather + psum_scatter(rows)
                 (ops.device_index._dist_rows)

and the production pipeline end to end with both backends.  CPU-mesh times
are NOT TPU times — collectives here are memcpys, not ICI hops — but the
RATIO isolates the structural cost (D× gather work over 1/D-size tables +
2 collective rounds per LF step) from everything else, and the step counts
are exact.  Run: python tools/shard_overhead.py
"""

import io
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path = [p for p in sys.path if ".axon_site" not in p]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench(fn, *args, reps=5):
    fn(*args)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.ops.device_index import DeviceFMIndex, occ_all4
    from bwamem2_tpu.ops.salookup import sa_lookup_kernel
    from bwamem2_tpu.parallel.mesh import make_mesh
    from bwamem2_tpu.parallel.shard_index import (index_specs, shard_index,
                                                  sharded_kernel)

    prefix = os.path.join(REPO, "tests", "fixtures", "ref_small.fa")
    fm = FMIndex.load(prefix)
    dfm = DeviceFMIndex.from_host(fm)
    mesh = make_mesh(8)
    sdfm = shard_index(mesh, dfm)
    spec = index_specs(sdfm)
    rng = np.random.default_rng(0)

    print("== single occ_all4 row-fetch round (1 gather/lane) ==")
    f_sh = sharded_kernel(mesh, occ_all4, spec, 1)
    f_rep = jax.jit(occ_all4)
    for n in (1024, 8192, 65536):
        pos = jnp.asarray(rng.integers(0, 2 * fm.l_pac, n), jnp.int64)
        t_rep = bench(f_rep, dfm, pos)
        t_sh = bench(f_sh, sdfm, pos)
        print(f"  lanes={n:6d}  replicated {t_rep*1e6:8.0f}us  "
              f"sharded {t_sh*1e6:8.0f}us  ratio {t_sh/t_rep:5.1f}x")

    print("== sa_lookup (LF walk, ~4 steps avg, 16-step unrolled body) ==")
    f_sh = sharded_kernel(mesh, sa_lookup_kernel, spec, 1)
    f_rep = jax.jit(sa_lookup_kernel)
    for n in (1024, 8192):
        pos = jnp.asarray(rng.integers(0, 2 * fm.l_pac, n), jnp.int64)
        t_rep = bench(f_rep, dfm, pos)
        t_sh = bench(f_sh, sdfm, pos)
        print(f"  lanes={n:6d}  replicated {t_rep*1e6:8.0f}us  "
              f"sharded {t_sh*1e6:8.0f}us  ratio {t_sh/t_rep:5.1f}x")

    print("== production pipeline (300 SE reads, ref_small) ==")
    from bwamem2_tpu.align.pipeline import Aligner
    from bwamem2_tpu.io.fastq import FastxReader
    from bwamem2_tpu.options import MemOptions
    from bwamem2_tpu.ops.backend import DeviceBackend
    from bwamem2_tpu.runtime import run_pipeline

    fq = os.path.join(REPO, "tests", "data", "reads_se.fq")
    opt = MemOptions().finalize()

    def run(be):
        al = Aligner(fm, opt, backend=be, verbose=0)
        out = io.StringIO()
        t0 = time.perf_counter()
        run_pipeline(al, FastxReader(fq), None, 40000, out, verbose=0,
                     n_workers=1)
        return time.perf_counter() - t0, out.getvalue()

    be_rep = DeviceBackend(fm, opt, index_prefix=prefix)
    be_sh = DeviceBackend(fm, opt, index_prefix=prefix, mesh=mesh)
    run(be_rep), run(be_sh)  # warm both kernel sets
    t_rep, sam_rep = run(be_rep)
    t_sh, sam_sh = run(be_sh)
    assert sam_rep == sam_sh
    print(f"  replicated {t_rep:6.2f}s   sharded {t_sh:6.2f}s   "
          f"ratio {t_sh/t_rep:4.1f}x   (bit-identical SAM)")


if __name__ == "__main__":
    main()
