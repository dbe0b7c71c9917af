"""GFN1-xTB parameter set.

Functional form follows Grimme, Bannwarth, Shushkov, JCTC 13, 1989 (2017)
(the method the reference drives through tblite:
/root/reference/src/methods/mqc_method_xtb.f90). All numeric values live in
this module (and can be overlaid from JSON via `load_overlay`) so the
parameterization can be refined without touching engine code.

PROVENANCE / STATUS: values are reconstructed from the published GFN1-xTB
parameterization. Entries marked CALIBRATE are best-effort reconstructions
still being validated against the reference energies (validation/): the
engine is exact in form; remaining energy deviations are parameter-table
deltas, tracked in validation reports.

Element coverage: currently H, C, N, O (full validation suite coverage);
the table layout supports Z=1..86.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

EV2AU = 1.0 / 27.21138505  # eV -> Hartree (tblite's autoev convention)


@dataclass
class ElementRecord:
    """Per-element GFN1 parameters. Energies in eV, lengths in Bohr."""

    shells: tuple          # e.g. ("1s", "2s") or ("2s", "2p")
    ngauss: tuple          # primitives per shell
    levels: tuple          # self energies H_l (eV)
    slater: tuple          # STO exponents zeta_l
    refocc: tuple          # reference shell occupations n0_l
    kcn: tuple             # CN shift of self energy per shell (eV)
    shpoly: tuple          # distance polynomial coefficient per shell
    gam: float             # atomic Hubbard hardness (Hartree)
    lgam: tuple            # shell hardness scaling factors
    gam3: float            # Hubbard derivative for third-order term (Hartree)
    alpha: float           # repulsion exponent
    zeff: float            # repulsion effective charge
    en: float              # Pauling electronegativity
    xbond: float = 0.0     # halogen-bond strength
    polarization: tuple = ()  # True per shell if polarization fn (K_pol)


@dataclass
class GlobalParams:
    """Global GFN1 parameters (paper Table 2)."""

    kss: float = 1.85
    kpp: float = 2.25
    kdd: float = 2.00
    ksp: float = 2.08        # CALIBRATE: explicit s-p pair scaling
    ksd: float = 2.00
    kpd: float = 2.00
    kpol: float = 2.85       # K for pairs involving a polarization shell
    ken: float = -0.007      # electronegativity factor k_EN
    kcn_exp: float = 16.0    # CN counting function steepness (exp type)
    kexp: float = 1.5        # repulsion distance exponent
    rexp: float = 1.0        # repulsion 1/R power
    gexp: float = 2.0        # Mataga-Nishimoto-Ohno-Klopman exponent
    # D3(BJ) dispersion for GFN1
    disp_s6: float = 1.0
    disp_s8: float = 2.4
    disp_a1: float = 0.63
    disp_a2: float = 5.0
    disp_s9: float = 0.0     # CALIBRATE: three-body ATM scale
    kdiff_enscale: bool = True  # apply EN factor to all off-site pairs


# ---------------------------------------------------------------------------
# Element records. Shell naming: principal quantum number + l letter.
# ---------------------------------------------------------------------------

ELEMENTS: dict = {
    # Z: record
    1: ElementRecord(  # H
        shells=("1s", "2s"),
        ngauss=(4, 3),               # CALIBRATE
        levels=(-10.923452, -2.171902),   # CALIBRATE (eV)
        slater=(1.207940, 1.993207),      # CALIBRATE
        refocc=(1.0, 0.0),
        kcn=(-0.5, 0.0),             # CALIBRATE (eV)
        shpoly=(0.0, 0.0),           # CALIBRATE
        gam=0.470099,                # CALIBRATE
        lgam=(1.0, 1.0),             # CALIBRATE
        gam3=0.000000,               # CALIBRATE
        alpha=2.209700,              # CALIBRATE
        zeff=1.116244,               # CALIBRATE
        en=2.20,
        polarization=(False, True),
    ),
    6: ElementRecord(  # C
        shells=("2s", "2p"),
        ngauss=(4, 4),               # CALIBRATE
        levels=(-13.970922, -10.063292),  # CALIBRATE
        slater=(2.096432, 1.800000),      # CALIBRATE
        refocc=(2.0, 2.0),
        kcn=(-0.275, 0.045),         # CALIBRATE
        shpoly=(-0.02448000, -0.01000000),  # CALIBRATE
        gam=0.479988,                # CALIBRATE
        lgam=(1.0, 1.0),             # CALIBRATE
        gam3=0.100000,               # CALIBRATE
        alpha=1.247655,              # CALIBRATE
        zeff=4.231078,               # CALIBRATE
        en=2.55,
        polarization=(False, False),
    ),
    7: ElementRecord(  # N
        shells=("2s", "2p"),
        ngauss=(4, 4),               # CALIBRATE
        levels=(-16.686243, -12.799341),  # CALIBRATE
        slater=(2.339881, 2.014332),      # CALIBRATE
        refocc=(2.0, 3.0),
        kcn=(-0.35, 0.07),           # CALIBRATE
        shpoly=(-0.02000000, -0.00500000),  # CALIBRATE
        gam=0.476106,                # CALIBRATE
        lgam=(1.0, 1.0),             # CALIBRATE
        gam3=0.120000,               # CALIBRATE
        alpha=1.682689,              # CALIBRATE
        zeff=5.242592,               # CALIBRATE
        en=3.04,
        polarization=(False, False),
    ),
    8: ElementRecord(  # O
        shells=("2s", "2p"),
        ngauss=(4, 4),               # CALIBRATE
        levels=(-20.229985, -15.503117),  # CALIBRATE
        slater=(2.439742, 2.137023),      # CALIBRATE
        refocc=(2.0, 4.0),
        kcn=(-0.45, 0.10),           # CALIBRATE
        shpoly=(-0.01500000, -0.00250000),  # CALIBRATE
        gam=0.583349,                # CALIBRATE
        lgam=(1.0, 1.0),             # CALIBRATE
        gam3=0.140000,               # CALIBRATE
        alpha=2.165712,              # CALIBRATE
        zeff=5.784415,               # CALIBRATE
        en=3.44,
        polarization=(False, False),
    ),
}


#: Covalent radii for coordination numbers (Angstrom; D3 set, scaled by 4/3
#: inside the counting function). Index Z, elements 1..18 filled.
COVALENT_RADII_A = np.zeros(119)
COVALENT_RADII_A[1:19] = [
    0.32, 0.46,
    1.20, 0.94, 0.77, 0.75, 0.71, 0.63, 0.64, 0.67,
    1.40, 1.25, 1.13, 1.04, 1.10, 1.02, 0.99, 0.96,
]

#: Atomic radii for the H0 distance polynomial (Angstrom). CALIBRATE:
#: reconstructed; the published set uses tabulated atomic radii.
ATOMIC_RADII_A = np.zeros(119)
ATOMIC_RADII_A[1:19] = [
    0.32, 0.46,
    1.20, 0.94, 0.77, 0.75, 0.71, 0.63, 0.64, 0.67,
    1.40, 1.25, 1.13, 1.04, 1.10, 1.02, 0.99, 0.96,
]

_L_OF_LETTER = {"s": 0, "p": 1, "d": 2, "f": 3}


def shell_n_l(shell: str):
    """("2p") -> (2, 1)."""
    return int(shell[0]), _L_OF_LETTER[shell[1]]


def get_element(z: int) -> ElementRecord:
    try:
        return ELEMENTS[z]
    except KeyError as exc:
        raise NotImplementedError(
            f"GFN1 parameters for Z={z} not tabulated yet"
        ) from exc


GLOBALS = GlobalParams()


def load_overlay(path: str) -> None:
    """Overlay parameter values from a JSON file (fitted tables).

    Standard ElementRecord fields update the records; the extended fields
    (en, rad [Bohr], rcov [Bohr], r4r2, d3_c6) update the shared radii and
    D3 tables. Caches are invalidated so subsequent batch builds see the
    new values.
    """
    with open(path, "r", encoding="utf-8") as fh:
        data = json.load(fh)
    for key, val in data.get("globals", {}).items():
        setattr(GLOBALS, key, val)
    for z_str, fields in data.get("elements", {}).items():
        z = int(z_str)
        rec = ELEMENTS[z]
        for key, val in fields.items():
            if key == "rad":
                ATOMIC_RADII_A[z] = float(val) * 0.52917721092
            elif key == "rcov":
                COVALENT_RADII_A[z] = float(val) * 0.52917721092
            elif key == "r4r2":
                from . import dispersion_d3

                dispersion_d3.R4R2[z] = float(val)
            elif key == "d3_c6":
                from . import dispersion_d3

                n = len(dispersion_d3.REF_C6_DIAG[z])
                dispersion_d3.REF_C6_DIAG[z] = list(val)[:n]
            else:
                object.__setattr__(
                    rec, key, tuple(val) if isinstance(val, list) else val
                )
    # invalidate caches without triggering circular imports at module load
    import sys as _sys

    _d3 = _sys.modules.get(__package__ + ".dispersion_d3")
    if _d3 is not None:
        _d3._element_ref_arrays.cache_clear()
    _batch = _sys.modules.get(__package__ + ".batch")
    if _batch is not None and hasattr(_batch, "element_basis"):
        _batch.element_basis.cache_clear()


# Auto-load fitted parameter overlay if present (written by tools/fit_*.py).
import os as _os

_OVERLAY_PATH = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "data", "gfn1_fitted.json")
if _os.path.exists(_OVERLAY_PATH):
    load_overlay(_OVERLAY_PATH)
