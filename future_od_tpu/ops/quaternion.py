"""Unit-quaternion helpers for IMU/ego-pose preprocessing.

Same math as the reference's dataset utils
(`/root/reference/future_od/datasets/utils.py:41-73`), written for numpy OR jax
arrays (the datasets run these on host with numpy; tests also exercise jnp).
Quaternions are (w, x, y, z) with the scalar part first.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _xp(q):
    # Dispatch on array module so datasets can stay numpy-only on host.
    return np if isinstance(q, np.ndarray) else jnp


def concat_quaternion(q1, q2):
    """Compose two rotations: first q1, then q2. Shapes (*, 4) -> (*, 4)."""
    xp = _xp(q1)
    a1, v1 = q1[..., 0:1], q1[..., 1:4]
    a2, v2 = q2[..., 0:1], q2[..., 1:4]
    scalar = a1 * a2 - xp.sum(v1 * v2, axis=-1, keepdims=True)
    vector = a1 * v2 + a2 * v1 + xp.cross(v1, v2)
    return xp.concatenate([scalar, vector], axis=-1)


def inverse_quaternion(q):
    """Inverse (= conjugate) of a unit quaternion, shape (*, 4)."""
    xp = _xp(q)
    return xp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)


def relative_pose(translation, rotation):
    """Make a clip's ego poses relative to its first frame.

    translation: (L, 3); rotation: (L, 4) unit quaternions.
    Returns (translation - translation[0], rotation ∘ rotation[0]^-1), matching
    nu_scenes.py:276-279 / nu_images.py:198-201.
    """
    xp = _xp(translation)
    translation = translation - translation[0:1]
    inv0 = inverse_quaternion(rotation[0:1])
    rotation = concat_quaternion(rotation, xp.broadcast_to(inv0, rotation.shape))
    return translation, rotation
