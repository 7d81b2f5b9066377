"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh BEFORE jax is imported anywhere:
the axon TPU tunnel (JAX_PLATFORMS=axon + PYTHONPATH site hook) would
otherwise grab a single real TPU chip, which is slow to initialize and
can't exercise multi-device sharding.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Drop the axon site hook from PYTHONPATH so the TPU plugin isn't loaded.
_axon = [p for p in sys.path if ".axon_site" in p]
for p in _axon:
    sys.path.remove(p)
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
)

# The site hook may have imported jax already and snapshotted
# jax_platforms=axon,cpu — env vars alone are then ignored.  Force the
# virtual CPU mesh through the config (no-op if a backend is already live).
try:  # noqa: E402
    import jax as _jax

    if (_jax.config.jax_platforms or "") != "cpu":
        _jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass

import pytest  # noqa: E402,F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")
FIXTURES = os.path.join(REPO, "tests", "fixtures")
