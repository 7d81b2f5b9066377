"""TPU device kernels (JAX / Pallas).

Importing this package enables jax x64: FM-index coordinates span up to
2 * 3.1 Gbp for human, which exceeds int32.  Hot gathers still use int32
block ids (occ block id = pos >> 6 < 2**31 for any real genome).
"""

import hashlib as _hashlib
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the kernel set is small and shape-bucketed,
# so warm starts skip all XLA compiles.  TPU-backed runs only: XLA:CPU
# AOT executables are not reliably round-trippable on this stack — cache
# entries written under one flag environment carry target-machine
# features another rejects at load ("+prefer-no-scatter ... could lead
# to execution errors such as SIGILL"), and cache reads/writes under
# concurrent compilation segfault outright (both observed as real
# crashes in the CPU-mesh test suite).  The dir is additionally keyed by
# the XLA/JAX environment so distinct flag sets never share entries.
if "cpu" not in _os.environ.get("JAX_PLATFORMS", ""):
    _envkey = _hashlib.sha1(
        (_os.environ.get("XLA_FLAGS", "") + "|"
         + _os.environ.get("JAX_PLATFORMS", "") + "|"
         + getattr(_jax, "__version__", "")).encode()).hexdigest()[:10]
    _cache = _os.environ.get("BWAMEM2_TPU_JAX_CACHE",
                             _os.path.expanduser(
                                 f"~/.cache/bwamem2_tpu_jax/{_envkey}"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
    except Exception:  # pragma: no cover
        pass


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def bucket_pow2(n: int, lo: int = 256) -> int:
    """Smallest bucket >= max(n, lo) from {lo, 1.5lo, 2lo, 3lo, 4lo, ...} —
    shape bucketing for jit with at most 2 variants per octave (a pure
    power-of-two ladder wastes up to 50% of the lanes; this caps waste at
    ~33% for one extra compile per octave, amortized by the persistent
    compilation cache)."""
    b = lo
    while b < n:
        if b + (b >> 1) >= n:
            return b + (b >> 1)
        b <<= 1
    return b


def fori_unroll2(lo: int, hi: int, body, st):
    """lax.fori_loop with the body unrolled 2x: per-iteration loop overhead
    (state round trips, control) is a large share of small-state device
    loops on the TPU backend, and halving the trip count claws most of it
    back.  On CPU (the test mesh) the unroll buys nothing and doubles the
    XLA program size — large accumulated-process compiles there have been
    observed to segfault the XLA:CPU compiler — so it stays a plain loop.
    `lo`/`hi` must be static."""
    import jax as _j
    if hi <= lo:
        return st
    if _j.default_backend() == "cpu":
        return _j.lax.fori_loop(lo, hi, body, st)
    n2 = (hi - lo) // 2

    def b2(i, s):
        t = lo + 2 * i
        return body(t + 1, body(t, s))

    st = _j.lax.fori_loop(0, n2, b2, st)
    if (hi - lo) & 1:
        st = body(hi - 1, st)
    return st
