#!/usr/bin/env python3
"""Freeze one quantitative anchor per element into regression fixtures.

Element coverage beyond HCNO is ESTIMATED (params_elements_ext.py): the
published tblite digits are not reproducible offline, so no 1e-6 energy
bar exists for Z > 8 (the reference trusts any Z <= 86 input via tblite,
/root/reference/src/methods/mqc_method_xtb.f90:58-296). Structural tests
(tests/test_elements_ext.py) pin that every element RUNS; this tool pins
that every element's PHYSICS cannot silently move: for each tabulated Z
it evaluates its hydride and oxide diatomic at a fixed geometry (1.05x
the covalent-radii sum) and freezes energy, Mulliken charges and dipole
into tests/data/gfn1_element_fixtures.json. tests/test_element_fixtures.py
asserts those values tightly, so any parameter fit that shifts Z > 8
behavior fails loudly and must regenerate the fixtures as an explicit,
reviewed step (rerun this tool, inspect, commit the diff).

Like the GFN2 set (tools/gen_gfn2_fixtures.py), these are
self-referential anchors at a known-good commit, not external ground
truth; the estimation provenance is documented in params_elements_ext.py
and docs/capabilities.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

OUT = os.path.join(REPO, "tests", "data", "gfn1_element_fixtures.json")

#: bond length factor on the covalent-radii sum — fixed forever; fixtures
#: pin the map (geometry -> observables), not equilibrium structures
BOND_FACTOR = 1.05


def diatomic_systems():
    """[(name, numbers, coords_bohr, charge, multiplicity)] for every
    tabulated element's hydride and oxide."""
    from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
    from metalquicha_tpu.methods.xtb import params_gfn1 as pg

    systems = []
    for z in sorted(pg.ELEMENTS):
        for partner, pname in ((1, "h"), (8, "o")):
            if z == partner:
                continue
            r_a = BOND_FACTOR * (
                pg.COVALENT_RADII_A[z] + pg.COVALENT_RADII_A[partner]
            )
            nel = sum(pg.ELEMENTS[z].refocc) + sum(
                pg.ELEMENTS[partner].refocc
            )
            mult = 1 if nel % 2 == 0 else 2
            coords = (
                np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r_a]])
                * ANGSTROM_TO_BOHR
            )
            systems.append(
                (
                    f"z{z:02d}{pname}",
                    np.array([z, partner]),
                    coords,
                    0,
                    mult,
                    r_a,
                )
            )
    return systems


def main() -> int:
    from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
    from metalquicha_tpu.methods.xtb.engine import settings_from_params

    calc = XtbCalculator(
        settings_from_params("gfn1", max_scf_iter=512, scf_tol=1e-11),
    )

    systems = diatomic_systems()
    # one padded batch: every diatomic has 2 atoms; shells/AOs pad to the
    # largest (spd) element — a single compile for the whole table
    frags = [(z, c, q, m) for _, z, c, q, m, _ in systems]
    batch = calc.make_batch(frags)
    e, aux = calc.energies(batch)
    e = np.asarray(e)
    resid = np.asarray(aux["scf_residual"])
    charges = np.asarray(aux["charges"])
    dipoles = np.asarray(aux["dipole"])

    fixtures = {}
    loose = []
    for k, (name, z, _c, _q, mult, r_a) in enumerate(systems):
        if resid[k] > 1e-8:
            loose.append((name, float(resid[k])))
        fixtures[name] = {
            "numbers": [int(v) for v in z],
            # exact double (json roundtrips floats exactly): the fitted
            # C6 grids have large extrapolation-corner entries whose
            # CN-interpolation weights amplify even a 1e-10 A geometry
            # round-off into ~1e-7 Ha on C/N diatomics
            "bond_angstrom": float(r_a),
            "multiplicity": int(mult),
            "energy_ha": float(e[k]),
            "charges": charges[k][:2].tolist(),
            "dipole_au": dipoles[k].tolist(),
            "scf_residual": float(resid[k]),
        }
    fixtures["_meta"] = {
        "bond_factor": BOND_FACTOR,
        "n_systems": len(systems),
        "note": "regenerate with tools/gen_element_fixtures.py; commit "
                "the diff deliberately — these pin ESTIMATED-element "
                "physics against silent fit drift (module docstring)",
    }
    if loose:
        print(f"[warn] {len(loose)} systems above 1e-8 SCC residual "
              f"(kept; fixtures record the residual): {loose[:5]} ...")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(fixtures, fh, indent=1)
    print(f"wrote {OUT}: {len(systems)} diatomics, "
          f"max resid {resid.max():.1e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
