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
# so warm starts skip all XLA compiles.  The dir is keyed by the XLA/JAX
# environment: CPU executables AOT-compiled under one flag set (e.g. the
# axon plugin env) carry target-machine features the plain-CPU env rejects
# at load ("+prefer-no-scatter ... could lead to SIGILL" — observed as
# real segfaults), so different environments must not share entries.
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
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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
    loops on this backend, and halving the trip count claws most of it
    back.  `lo`/`hi` must be static."""
    import jax as _j
    if hi <= lo:
        return st
    n2 = (hi - lo) // 2

    def b2(i, s):
        t = lo + 2 * i
        return body(t + 1, body(t, s))

    st = _j.lax.fori_loop(0, n2, b2, st)
    if (hi - lo) & 1:
        st = body(hi - 1, st)
    return st
