"""Platform selection helper for the CLIs.

The deployment image pins JAX_PLATFORMS at interpreter start (sitecustomize),
so a plain env var set by the user is ignored once jax is imported. Honoring
AACLIP_PLATFORM via jax.config gives CLIs a working override (e.g. cpu for
smoke runs when no TPU is attached)."""
from __future__ import annotations

import os


def apply_platform_override():
    plat = os.environ.get("AACLIP_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    if os.environ.get("AACLIP_MULTIHOST") == "1":
        # Pod deployments: every process must join the distributed runtime
        # before its first backend touch (parallel/multihost.py). No-op
        # unless explicitly opted in.
        from .parallel.multihost import maybe_initialize

        maybe_initialize()
