"""Multi-PMT optical module hit conversion (KM3NeT-style).

Equivalent of I3PhotonToMCHitConverterForMultiPMT
(private/clsim/dom/I3PhotonToMCHitConverterForMultiPMT.cxx): an OM carries
many small PMTs at fixed orientations; a photon recorded on the OM sphere is
assigned to the PMT whose cathode it geometrically enters, with the
acceptance product

    p = weight * wavelengthAcceptance(lambda) * angularAcceptance(cos eta)

per PMT (eta vs the PMT axis), accept/reject.  PMT assignment uses the
photon's DOM-relative hit position: it must fall within the PMT's opening
cone (cathode radius / OM radius) around the PMT direction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..medium.functions import TableParams, eval_polynomial, eval_table


class MultiPMTLayout(NamedTuple):
    """PMT directions (unit, pointing outward from the OM center) and the
    cathode opening half-angle cosine."""
    dirs: jnp.ndarray        # (n_pmt, 3)
    cos_opening: float       # static


# KM3NeT DOM ring arrangement (zenith angle from straight up, PMT count,
# azimuth offset): 12 PMTs in two upper-hemisphere rings at 56 and 72 deg,
# 18 in three lower rings at 107, 124 and 148 deg staggered by 30 deg, plus
# one nadir PMT -- the published 31-PMT multi-PMT DOM design the reference
# converter reads from its detector geometry service
# (I3PhotonToMCHitConverterForMultiPMT.cxx:150-230 consumes per-PMT
# direction records exactly like these).
KM3NET_PMT_RINGS = [
    (56.0, 6, 0.0),
    (72.0, 6, 30.0),
    (107.0, 6, 0.0),
    (124.0, 6, 30.0),
    (148.0, 6, 0.0),
    (180.0, 1, 0.0),
]


def km3net_31_pmt_layout(om_radius: float = 0.2159,
                         pmt_cathode_radius: float = 0.04
                         ) -> MultiPMTLayout:
    """The 31-PMT KM3NeT DOM from the published ring arrangement
    (KM3NET_PMT_RINGS); the cathode opening half-angle follows from the
    3-inch PMT photocathode radius against the 17-inch sphere."""
    dirs = []
    for zen_deg, count, azi0_deg in KM3NET_PMT_RINGS:
        cz = np.cos(np.radians(zen_deg))
        sz = np.sin(np.radians(zen_deg))
        for k in range(count):
            phi = np.radians(azi0_deg) + 2 * np.pi * k / max(count, 1)
            dirs.append([sz * np.cos(phi), sz * np.sin(phi), cz])
    cos_opening = float(np.cos(np.arcsin(
        min(pmt_cathode_radius / om_radius, 1.0))))
    return MultiPMTLayout(dirs=jnp.asarray(dirs, jnp.float32),
                          cos_opening=cos_opening)


def assign_pmts(layout: MultiPMTLayout, hit_x, hit_y, hit_z):
    """PMT index for DOM-relative hit positions, or -1 if no cathode covers
    the entry point."""
    r = jnp.sqrt(hit_x ** 2 + hit_y ** 2 + hit_z ** 2)
    nx = hit_x / jnp.maximum(r, 1e-20)
    ny = hit_y / jnp.maximum(r, 1e-20)
    nz = hit_z / jnp.maximum(r, 1e-20)
    cos = (nx[:, None] * layout.dirs[None, :, 0]
           + ny[:, None] * layout.dirs[None, :, 1]
           + nz[:, None] * layout.dirs[None, :, 2])
    best = jnp.argmax(cos, axis=1).astype(jnp.int32)
    best_cos = jnp.max(cos, axis=1)
    return jnp.where(best_cos >= layout.cos_opening, best, -1)


def sample_multi_pmt_hits(rec: dict, rec_count, key,
                          layout: MultiPMTLayout,
                          wlen_acceptance: TableParams,
                          angular_coeffs, efficiency=1.0):
    """Photon records -> (valid, dom, pmt, time) accepted photoelectrons."""
    n_slots, cap = rec["time"].shape
    flat = {k: v.reshape(-1) for k, v in rec.items()}
    slot_idx = jnp.repeat(jnp.arange(n_slots), cap)
    pos_in_slot = jnp.tile(jnp.arange(cap), n_slots)
    valid = pos_in_slot < jnp.minimum(rec_count, cap)[slot_idx]

    pmt = assign_pmts(layout, flat["pos_x"], flat["pos_y"], flat["pos_z"])

    theta = flat["dir_theta"]
    phi = flat["dir_phi"]
    dx = jnp.sin(theta) * jnp.cos(phi)
    dy = jnp.sin(theta) * jnp.sin(phi)
    dz = jnp.cos(theta)
    pmt_c = jnp.clip(pmt, 0, layout.dirs.shape[0] - 1)
    ax = layout.dirs[pmt_c, 0]
    ay = layout.dirs[pmt_c, 1]
    az = layout.dirs[pmt_c, 2]
    cos_impact = -(dx * ax + dy * ay + dz * az)

    from .acceptance import angular_factor
    p = flat["weight"]
    p = p * eval_table(wlen_acceptance, flat["wavelength"])
    p = p * angular_factor(angular_coeffs, cos_impact)
    p = p * efficiency
    u = jax.random.uniform(key, p.shape)
    accept = valid & (pmt >= 0) & (p > u)
    return accept, flat["dom"].astype(jnp.int32), pmt, flat["time"]
