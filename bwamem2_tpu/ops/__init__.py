"""TPU device kernels (JAX / Pallas).

Importing this package enables jax x64: FM-index coordinates span up to
2 * 3.1 Gbp for human, which exceeds int32.  Hot gathers still use int32
block ids (occ block id = pos >> 6 < 2**31 for any real genome).
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
