"""Platform selection shim.

In this deployment the axon TPU plugin registers itself with priority and
the ``JAX_PLATFORMS`` environment variable is silently ignored; only
``jax.config.update("jax_platforms", ...)`` is honored.  Call
``apply_platform_env()`` before first device use so the conventional env
var works as users expect.
"""

from __future__ import annotations

import os

_applied = False


def apply_platform_env():
    global _applied
    if _applied:
        return
    _applied = True
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax

        jax.config.update("jax_platforms", p)
