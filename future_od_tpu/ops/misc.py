"""Small numeric helpers."""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Clamped logit, the inverse of sigmoid on [0, 1].

    Mirrors the DETR-family `inverse_sigmoid` the reference imports
    (paper.py:29,406): clamp x to [0,1], floor numerator/denominator at eps.
    """
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
