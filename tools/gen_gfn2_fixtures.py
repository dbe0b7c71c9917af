#!/usr/bin/env python3
"""Freeze GFN2 observables into regression fixtures (VERDICT r3 item 8).

The in-tree GFN2 ground truth is a single upstream molecule (w1_vib_therm,
a water monomer). To keep parameter fits from silently moving everything
else, this tool evaluates a panel of OTHER systems — ammonia, methane, and
a hydrogen-bonded water dimer with its interaction energy — at the
currently-installed GFN2 tables and writes tests/data/gfn2_fixtures.json.
tests/test_gfn2_fixtures.py then asserts those values to tight tolerances,
so any future fit that shifts GFN2 behavior outside the water-monomer
calibration point fails loudly and has to regenerate the fixtures as an
EXPLICIT, reviewed step (rerun this tool and commit the diff).

These fixtures are self-referential (they pin the implementation against
itself at a known-good commit), not external ground truth; the reference's
GFN2 is digit-exact via tblite (mqc_method_xtb.f90:121), which is offline
here. The validation envelope is documented in docs/capabilities.md.
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

from metalquicha_tpu.constants import ANGSTROM_TO_BOHR  # noqa: E402

OUT = os.path.join(REPO, "tests", "data", "gfn2_fixtures.json")

# Geometries in Angstrom (standard near-equilibrium structures; the exact
# values only need to be FIXED, not optimal — fixtures pin the map
# geometry -> observables).
SYSTEMS = {
    "nh3": {
        "numbers": [7, 1, 1, 1],
        "coords": [
            [0.0000, 0.0000, 0.1173],
            [0.0000, 0.9377, -0.2738],
            [0.8121, -0.4689, -0.2738],
            [-0.8121, -0.4689, -0.2738],
        ],
    },
    "ch4": {
        "numbers": [6, 1, 1, 1, 1],
        "coords": [
            [0.0000, 0.0000, 0.0000],
            [0.6276, 0.6276, 0.6276],
            [-0.6276, -0.6276, 0.6276],
            [0.6276, -0.6276, -0.6276],
            [-0.6276, 0.6276, -0.6276],
        ],
    },
    # Smith/Klemperer-style linear H-bonded water dimer (donor O-H...O)
    "w2_donor": {
        "numbers": [8, 1, 1],
        "coords": [
            [0.0000, 0.0000, 0.0000],
            [0.9572, 0.0000, 0.0000],
            [-0.2399, 0.9272, 0.0000],
        ],
    },
    "w2_acceptor": {
        "numbers": [8, 1, 1],
        "coords": [
            [2.9070, 0.0000, 0.0000],
            [3.4500, 0.7572, -0.2000],
            [3.4500, -0.7572, -0.2000],
        ],
    },
    "w2_dimer": {
        "numbers": [8, 1, 1, 8, 1, 1],
        "coords": [
            [0.0000, 0.0000, 0.0000],
            [0.9572, 0.0000, 0.0000],
            [-0.2399, 0.9272, 0.0000],
            [2.9070, 0.0000, 0.0000],
            [3.4500, 0.7572, -0.2000],
            [3.4500, -0.7572, -0.2000],
        ],
    },
}


def main() -> int:
    from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
    from metalquicha_tpu.methods.xtb.engine import settings_from_params

    calc = XtbCalculator(
        settings_from_params("gfn2", multipoles=True, max_scf_iter=256,
                             scf_tol=1e-11),
        variant="gfn2",
    )

    fixtures = {}
    for name, spec in SYSTEMS.items():
        z = np.array(spec["numbers"])
        c = np.array(spec["coords"]) * ANGSTROM_TO_BOHR
        batch = calc.make_batch([(z, c, 0, 1)])
        e, aux = calc.energies(batch)
        resid = float(np.asarray(aux["scf_residual"])[0])
        assert resid < 1e-9, (name, resid)
        n = len(z)
        fixtures[name] = {
            "numbers": spec["numbers"],
            "coords_angstrom": spec["coords"],
            "energy_ha": float(np.asarray(e)[0]),
            "charges": np.asarray(aux["charges"])[0][:n].tolist(),
            "dipole_au": np.asarray(aux["dipole"])[0].tolist(),
            "scf_residual": resid,
        }
        print(f"{name}: E={fixtures[name]['energy_ha']:.12f} "
              f"|mu|={np.linalg.norm(fixtures[name]['dipole_au']):.6f} "
              f"resid={resid:.1e}")

    ie = (
        fixtures["w2_dimer"]["energy_ha"]
        - fixtures["w2_donor"]["energy_ha"]
        - fixtures["w2_acceptor"]["energy_ha"]
    )
    fixtures["_meta"] = {
        "w2_interaction_energy_ha": ie,
        "note": "regenerate with tools/gen_gfn2_fixtures.py; commit the "
                "diff deliberately — these pin GFN2 against silent fit "
                "drift (see module docstring)",
    }
    print(f"w2 interaction energy: {ie*627.5094740631:.4f} kcal/mol")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(fixtures, fh, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
