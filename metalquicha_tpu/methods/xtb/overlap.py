"""Batched Gaussian overlap integrals in JAX.

Computes the AO overlap matrix for a padded fragment in one shot: all
(AO, AO, primitive, primitive) combinations are evaluated densely with the
Obara-Saika 1D factors and reduced — no data-dependent control flow, so the
whole thing jits, vmaps over fragment batches, and differentiates cleanly
(needed for autodiff gradients).

The 1D overlap factors S_ij follow the standard recursion
    S_{i+1,j} = XPA S_ij + (i S_{i-1,j} + j S_{i,j-1}) / (2p)
unrolled at trace time up to l = MAX_L per side.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_L = 2  # up to d functions


def _s1d(i, j, xpa, xpb, inv2p):
    """Recursive closed form of the 1D OS overlap factor (traced, unrolled)."""
    if i < 0 or j < 0:
        return jnp.zeros_like(xpa)
    if i == 0 and j == 0:
        return jnp.ones_like(xpa)
    if i >= j:
        term = xpa * _s1d(i - 1, j, xpa, xpb, inv2p)
        if i - 1 > 0:
            term = term + (i - 1) * inv2p * _s1d(i - 2, j, xpa, xpb, inv2p)
        if j > 0:
            term = term + j * inv2p * _s1d(i - 1, j - 1, xpa, xpb, inv2p)
        return term
    term = xpb * _s1d(i, j - 1, xpa, xpb, inv2p)
    if j - 1 > 0:
        term = term + (j - 1) * inv2p * _s1d(i, j - 2, xpa, xpb, inv2p)
    if i > 0:
        term = term + i * inv2p * _s1d(i - 1, j - 1, xpa, xpb, inv2p)
    return term


def overlap_matrix(
    coords,       # (nat, 3) Bohr
    ao_atom,      # (nao,) int: atom of each AO
    ao_lxyz,      # (nao, nprim, 3) int: cartesian powers of each entry
                  # (spherical d AOs carry multiple cartesian components
                  # folded into the primitive axis)
    prim_alpha,   # (nao, nprim): primitive exponents per AO (0-padded)
    prim_coeff,   # (nao, nprim): contraction coeffs * primitive norms
    onsite_identity: bool = True,
):
    """Dense AO overlap matrix (nao, nao).

    Padding convention: padded AOs must have prim_coeff == 0; their rows and
    columns come out zero, then `onsite_identity` puts 1 on the full diagonal
    (valid for xTB where same-atom shells are orthonormal by construction,
    and it keeps the padded block well-conditioned for eigensolves).
    """
    nao = ao_atom.shape[0]

    A = coords[ao_atom]                       # (nao, 3)
    AB = A[:, None, :] - A[None, :, :]        # (nao, nao, 3)
    rab2 = (AB**2).sum(-1)                    # (nao, nao)

    ai = prim_alpha[:, None, :, None]         # (nao, 1, np, 1)
    aj = prim_alpha[None, :, None, :]         # (1, nao, 1, np)
    p = ai + aj
    p = jnp.where(p > 0, p, 1.0)              # guard padded primitive pairs
    inv2p = 0.5 / p
    mu = ai * aj / p

    # Gaussian product prefactor
    pref = (jnp.pi / p) ** 1.5 * jnp.exp(-mu * rab2[:, :, None, None])

    # Gaussian product center offsets per dimension:
    # P = (ai*A + aj*B)/p; XPA = P - A = aj*(B-A)/p; XPB = P - B = ai*(A-B)/p
    sdim = None
    for d in range(3):
        li = ao_lxyz[:, None, :, None, d]     # (nao, 1, np, 1)
        lj = ao_lxyz[None, :, None, :, d]     # (1, nao, 1, np)
        ab_d = AB[:, :, d][:, :, None, None]  # A_d - B_d
        xpa = -aj * ab_d / p                  # P_d - A_d = aj*(B-A)/p
        xpb = ai * ab_d / p                   # P_d - B_d = ai*(A-B)/p
        s_d = jnp.zeros_like(pref)
        for i in range(MAX_L + 1):
            for j in range(MAX_L + 1):
                mask = (li == i) & (lj == j)
                s_ij = _s1d(i, j, xpa, xpb, inv2p)
                s_d = jnp.where(mask, s_ij, s_d)
        sdim = s_d if sdim is None else sdim * s_d

    prim_s = pref * sdim                      # (nao, nao, np, np)
    cc = prim_coeff[:, None, :, None] * prim_coeff[None, :, None, :]
    S = (prim_s * cc).sum(axis=(2, 3))

    # Coincident atoms (e.g. two hydrogen caps replacing the same excluded
    # atom in gappy GMBE intersection terms) are treated as NON-interacting,
    # matching the tblite behavior of skipping r ~ 0 pairs.
    coincident = (rab2 < 1e-10) & (ao_atom[:, None] != ao_atom[None, :])
    S = jnp.where(coincident, 0.0, S)

    # Same-atom blocks are orthonormal by construction in the xTB basis
    # (angular orthogonality, explicit 1s/2s orthogonalization for H, and
    # spherical-harmonic d combinations); snap them to the identity to
    # remove integration noise and keep padded AOs well-conditioned.
    if onsite_identity:
        same_atom = ao_atom[:, None] == ao_atom[None, :]
        eye = jnp.eye(nao, dtype=S.dtype)
        S = jnp.where(same_atom, eye, S)
    return S


def build_ao_norms(alphas: np.ndarray, l: int, lxyz) -> np.ndarray:
    """Per-primitive cartesian norms for one AO (host-side helper)."""
    from .basis import primitive_norm

    return np.array(
        [primitive_norm(a, *lxyz) if a > 0 else 0.0 for a in alphas]
    )
