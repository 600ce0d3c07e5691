"""Named weight initializers (reference ``posetimation/utils/weight_init.py``
surface — present-but-unused there; useful for experiment configs here)."""

import jax.numpy as jnp
from flax.linen import initializers


def get_initializer(name: str, **kwargs):
    """'kaiming' | 'xavier' | 'normal' | 'uniform' | 'constant' -> flax init."""
    name = name.lower()
    if name in ("kaiming", "kaiming_uniform", "he"):
        # torch kaiming_uniform(a=sqrt(5)) equivalent scale
        return initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    if name == "kaiming_normal":
        return initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
    if name in ("xavier", "glorot"):
        return initializers.xavier_uniform()
    if name == "xavier_normal":
        return initializers.xavier_normal()
    if name == "normal":
        return initializers.normal(stddev=kwargs.get("std", 0.001))
    if name == "uniform":
        s = kwargs.get("scale", 0.01)
        return initializers.uniform(scale=s)
    if name == "constant":
        v = kwargs.get("value", 0.0)
        return lambda key, shape, dtype=jnp.float32: jnp.full(shape, v, dtype)
    if name == "lecun":
        return initializers.lecun_normal()
    raise KeyError(f"Unknown initializer {name!r}")
