"""Direction rotation for scattering / Cherenkov cone sampling.

Vectorized equivalent of the reference's scatterDirectionByAngle
(propagation_kernel.c.cl:83-129): rotate a unit vector by a polar angle
(given as cos/sin) around a uniformly random azimuth about its own axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x):
    """sqrt(max(x, 0)) with a finite gradient at x <= 0 (the standard
    where-inside-where guard; a bare sqrt(maximum(x,0)) produces NaN
    cotangents at the clamp)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def scatter_direction_by_angle(cosa, sina, dx, dy, dz, u_azimuth):
    """Rotate unit direction (dx,dy,dz) by angle (cosa,sina) with azimuth
    2*pi*u_azimuth about the old direction.  Branchless version of the
    vertical/non-vertical split; renormalizes like the reference."""
    b = 2.0 * jnp.pi * u_azimuth
    cosb = jnp.cos(b)
    sinb = jnp.sin(b)

    sinth = safe_sqrt(1.0 - dz * dz)

    # general (non-vertical) branch.  The guard value for the vertical
    # case must be O(1), NOT a tiny epsilon: the untaken branch still gets
    # cotangents under AD, and 1/eps**2 overflows to inf -> where() turns
    # it into NaN (the where-grad trap).  Primal unchanged (sinth > 0
    # lanes divide by the true sinth).
    safe_sinth = jnp.where(sinth > 0.0, sinth, 1.0)
    gx = dx * cosa - (dy * cosb + dz * dx * sinb) * sina / safe_sinth
    gy = dy * cosa + (dx * cosb - dz * dy * sinb) * sina / safe_sinth
    gz = dz * cosa + sina * sinb * sinth

    # vertical branch
    vx = sina * cosb
    vy = sina * sinb
    vz = cosa * jnp.sign(dz)

    vertical = sinth <= 0.0
    nx = jnp.where(vertical, vx, gx)
    ny = jnp.where(vertical, vy, gy)
    nz = jnp.where(vertical, vz, gz)

    inv_norm = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
    return nx * inv_norm, ny * inv_norm, nz * inv_norm


def sph_to_cart(theta, phi):
    st = jnp.sin(theta)
    return st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)


def cart_to_sph(dx, dy, dz):
    """(theta, phi) with theta in [0, pi], phi in [0, 2pi) -- matches the
    reference's sphDirFromCar (propagation_kernel.c.cl:186-224)."""
    r_inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    cz = jnp.clip(dz * r_inv, -1.0, 1.0)
    theta = jnp.arccos(cz)
    phi = jnp.arctan2(dy, dx)
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi
