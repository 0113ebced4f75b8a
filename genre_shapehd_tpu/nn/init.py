"""Weight initializers matching the reference's `init_weight` semantics.

/root/reference/models/netinterface.py:38-63: conv/linear weights get
kaiming-normal (fan_in, a=0), biases 0; BatchNorm scale ~ N(1, 0.02),
BatchNorm bias 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# torch kaiming_normal_(a=0, mode='fan_in') == N(0, sqrt(2/fan_in))
kaiming_normal = variance_scaling(2.0, "fan_in", "normal")


def bn_scale_init(param: float = 0.02):
    """BatchNorm scale ~ N(1.0, init_param)."""
    def init(key, shape, dtype=jnp.float32):
        return 1.0 + param * jax.random.normal(key, shape, dtype)
    return init
