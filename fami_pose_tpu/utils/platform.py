"""Make the ``JAX_PLATFORMS`` env var authoritative.

The axon TPU plugin (when installed) pins ``jax_platforms=axon,cpu`` at
interpreter startup, which silently overrides the ``JAX_PLATFORMS`` env var
— ``JAX_PLATFORMS=cpu python tools/demo.py`` would still try to initialize
the TPU relay (and hang if it is unreachable). CLI entry points call
:func:`apply_jax_platforms_env` right after importing jax so the documented
env-var contract holds; it is a no-op when the var is unset.
"""

import os


def apply_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    jax.config.update("jax_platforms", plats)
