"""AO multipole-moment integrals for GFN2's anisotropic electrostatics.

Dipole and quadrupole matrix elements relative to the BRA atom's center:
    D^d_ij   = <i| (r - R_A)_d |j>          d in {x, y, z}
    Q^dd'_ij = <i| (r - R_A)_d (r - R_A)_d' |j>

computed with the same Obara-Saika 1D machinery as the overlap
(overlap.py): a moment of order m about center A is a linear combination
of 1D overlaps with the bra angular momentum raised,
    <i| (x - A_x) |j>_1D = S1d(i+1, j) ... via x - A_x = (x - P_x) + PA_x
handled by evaluating S1d with the bra index incremented (the OS recursion
is exactly the multiplication by (x - A_x)).

tblite builds the same integrals for its GFN2 multipole moments
(reference path: mqc_method_xtb.f90 -> tblite gfn2 calculator).
"""

from __future__ import annotations

import jax.numpy as jnp

from .overlap import MAX_L, _s1d


def _sdim_tables(coords, ao_atom, ao_lxyz, prim_alpha, max_extra=2):
    """Per-dimension 1D overlap factors with the BRA index raised by 0..2.

    Returns pref (nao,nao,np,np) and s1[d][k] = 1D factor for dimension d
    with bra angular index incremented by k, plus PA_d offsets.
    """
    A = coords[ao_atom]
    AB = A[:, None, :] - A[None, :, :]
    rab2 = (AB**2).sum(-1)

    ai = prim_alpha[:, None, :, None]
    aj = prim_alpha[None, :, None, :]
    p = ai + aj
    p = jnp.where(p > 0, p, 1.0)
    inv2p = 0.5 / p
    mu = ai * aj / p
    pref = (jnp.pi / p) ** 1.5 * jnp.exp(-mu * rab2[:, :, None, None])

    tables = []
    pa_list = []
    for d in range(3):
        li = ao_lxyz[:, None, :, None, d]
        lj = ao_lxyz[None, :, None, :, d]
        ab_d = AB[:, :, d][:, :, None, None]
        xpa = -aj * ab_d / p
        xpb = ai * ab_d / p
        per_k = []
        for k in range(max_extra + 1):
            s_d = jnp.zeros_like(pref)
            for i in range(MAX_L + max_extra + 1):
                for j in range(MAX_L + 1):
                    sel = (li == i - k) & (lj == j) & (li >= 0)
                    if i - k < 0 or i > MAX_L + k:
                        continue
                    s_ij = _s1d(i, j, xpa, xpb, inv2p)
                    s_d = jnp.where(sel, s_ij, s_d)
            per_k.append(s_d)
        tables.append(per_k)
        pa_list.append(xpa)
    return pref, tables, pa_list


def moment_matrices(coords, ao_atom, ao_lxyz, prim_alpha, prim_coeff):
    """(S, D, Q): overlap, dipole (3, nao, nao), quadrupole (6, nao, nao).

    Moments are about the BRA atom center; quadrupole components ordered
    (xx, yy, zz, xy, xz, yz). Uses the identity
      (x - A_x) g_i = g_{i+1}  (unnormalized cartesian index raise)
    so  <i|(x-A_x)^m|j>_1D = S1d(i+m, j).
    """
    pref, tabs, _pa = _sdim_tables(coords, ao_atom, ao_lxyz, prim_alpha)
    cc = prim_coeff[:, None, :, None] * prim_coeff[None, :, None, :]

    def contract(kx, ky, kz):
        val = pref * tabs[0][kx] * tabs[1][ky] * tabs[2][kz]
        return (val * cc).sum(axis=(2, 3))

    S = contract(0, 0, 0)
    D = jnp.stack([contract(1, 0, 0), contract(0, 1, 0), contract(0, 0, 1)])
    Q = jnp.stack(
        [
            contract(2, 0, 0),
            contract(0, 2, 0),
            contract(0, 0, 2),
            contract(1, 1, 0),
            contract(1, 0, 1),
            contract(0, 1, 1),
        ]
    )
    return S, D, Q
