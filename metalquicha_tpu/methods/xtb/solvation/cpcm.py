"""CPCM (conductor-like polarizable continuum) solvation.

Surface charges on a vdW cavity screen the atomic partial charges:
    A s = -f B q        E_solv = 1/2 q^T Gamma q,  Gamma = -f B^T A^-1 B
with f = (eps-1)/(eps+x). Static-shape JAX implementation: every atom
carries a full angular grid; buried points are smoothly switched off via
their effective area (their self-interaction diverges, driving their charge
to zero) — no dynamic point counts, so the whole solve jits and batches.

Grid: exact Lebedev rules for tabulated orders, Gauss-Legendre x phi
product quadrature otherwise (grids.angular_grid) — the reference stack
uses Lebedev-Laikov grids (cpcm_nang selects the order,
/root/reference/src/methods/mqc_method_xtb.f90:557-671); the production
orders' Laikov weight tables are not reproducible offline, so large orders
use the spectrally-exact product rule and the CPCM scalars are calibrated
on the grid actually used (see grids.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ....constants import ANGSTROM_TO_BOHR
from .born import PARAM_SETS

COSMO_X = 0.5          # f = (eps-1)/(eps+COSMO_X); CALIBRATE
SELF_INTERACTION = 1.07  # zeta in A_kk = zeta*sqrt(4 pi / a_k)
SWITCH_WIDTH = 0.3     # Bohr, burial switching smoothness


def fibonacci_sphere(n: int) -> np.ndarray:
    """n quasi-uniform unit vectors (spherical Fibonacci lattice)."""
    i = np.arange(n) + 0.5
    phi = np.pi * (1.0 + 5.0**0.5) * i
    z = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)


@dataclass
class CpcmSolvation:
    dielectric: float
    nang: int = 110
    rscale: float = 1.0
    kind: str = "cpcm"

    def host_tables(self, numbers):
        nat = len(numbers)
        rvdw = np.zeros(nat)
        for i, z in enumerate(numbers):
            z = int(z)
            if z:
                rvdw[i] = PARAM_SETS["cpcm"]["vdw"][z] * ANGSTROM_TO_BOHR * self.rscale
        return {"solv_rvdw": rvdw, "solv_sx": np.zeros(nat)}

    def default_scalars(self):
        """[cosmo_x, self_interaction_zeta, unused, unused]."""
        return np.array([COSMO_X, SELF_INTERACTION, 0.0, 0.0])

    def gamma_atoms(self, coords, rvdw, sx, atom_mask, scalars=None):
        from .grids import angular_grid

        cosmo_x = scalars[0] if scalars is not None else COSMO_X
        zeta = scalars[1] if scalars is not None else SELF_INTERACTION
        nat = coords.shape[0]
        pts_np, w_np = angular_grid(self.nang)
        nang = len(w_np)
        unit = jnp.asarray(pts_np, dtype=coords.dtype)
        gw = jnp.asarray(w_np, dtype=coords.dtype)

        radii = jnp.where(rvdw > 0, rvdw, 1.0)
        # surface points: (nat, nang, 3)
        pts = coords[:, None, :] + radii[:, None, None] * unit[None, :, :]
        pts_flat = pts.reshape(nat * nang, 3)

        # smooth burial switch: product over OTHER atoms of a sigmoid in the
        # signed distance outside each sphere
        d_at = jnp.linalg.norm(
            pts[:, :, None, :] - coords[None, None, :, :], axis=-1
        )  # (nat, nang, nat)
        signed = d_at - radii[None, None, :]
        sw = 1.0 / (1.0 + jnp.exp(-signed / SWITCH_WIDTH))
        not_self = 1.0 - jnp.eye(nat, dtype=coords.dtype)[:, None, :]
        sw = jnp.where(
            (not_self > 0.5) & (atom_mask[None, None, :] > 0.5), sw, 1.0
        )
        weight = sw.prod(-1) * atom_mask[:, None]  # (nat, nang)
        area = (4.0 * jnp.pi * gw[None, :]) * radii[:, None] ** 2 * weight
        area_flat = area.reshape(nat * nang)

        # A matrix
        npts = nat * nang
        dpp = jnp.linalg.norm(
            pts_flat[:, None, :] - pts_flat[None, :, :], axis=-1
        ) + jnp.eye(npts, dtype=coords.dtype)
        A = 1.0 / dpp
        a_kk = zeta * jnp.sqrt(
            4.0 * jnp.pi / jnp.maximum(area_flat, 1e-8)
        )
        A = A * (1.0 - jnp.eye(npts, dtype=coords.dtype)) + jnp.diag(a_kk)

        # B matrix: points x atoms
        dpa = jnp.linalg.norm(
            pts_flat[:, None, :] - coords[None, :, :], axis=-1
        )
        B = 1.0 / jnp.maximum(dpa, 0.1)
        B = B * atom_mask[None, :]

        eps = self.dielectric
        f = (eps - 1.0) / (eps + cosmo_x)
        AinvB = jnp.linalg.solve(A, B)
        gamma = -f * (B.T @ AinvB)
        gamma = 0.5 * (gamma + gamma.T)
        return gamma * (atom_mask[:, None] * atom_mask[None, :])
