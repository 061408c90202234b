"""Batched 3x3 matrix helpers built from elementwise VPU ops.

JAX's default matmul precision on TPU is bfloat16 — catastrophic for XPBD
constraint math (deformation gradients live at 1 +- 1e-4).  These helpers
express every 3x3 contraction as broadcast multiply + sum, which lowers to
exact-f32 VPU code and avoids the MXU entirely (for 3x3, elementwise is also
faster than a systolic-array pass).

Convention matches the reference's column-major mat3 (Softbody.js:357-410):
``m[..., r, c]`` — columns are vectors (edge matrices store edges as columns).
"""
from __future__ import annotations

import jax.numpy as jnp


def matmul(a, b):
    """c[...,i,j] = sum_k a[...,i,k] * b[...,k,j] — exact f32."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def matmul_t(a, b):
    """a @ b^T: c[...,i,j] = sum_k a[...,i,k] * b[...,j,k] — exact f32."""
    return jnp.sum(a[..., :, None, :] * b[..., None, :, :], axis=-1)


def det(m):
    """Determinant via first-column cofactor (Softbody.js:381-387)."""
    c0, c1, c2 = m[..., 0], m[..., 1], m[..., 2]
    return jnp.sum(c0 * jnp.cross(c1, c2), axis=-1)


def cofactor_columns(m):
    """[col1 x col2 | col2 x col0 | col0 x col1] (Softbody.js:140-142)."""
    c0, c1, c2 = m[..., 0], m[..., 1], m[..., 2]
    return jnp.stack([jnp.cross(c1, c2), jnp.cross(c2, c0), jnp.cross(c0, c1)], axis=-1)


def outer_sum(a, b):
    """c[...,r,c] = sum_k a[...,k,r] * b[...,k,c] (covariance of two point
    sets; ``TransposeMult``, SoftbodyGPU.js:90-105) — exact f32."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)
