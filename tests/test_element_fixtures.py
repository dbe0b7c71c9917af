"""Frozen per-element anchors (VERDICT r4 item 6).

Every tabulated element's hydride and oxide diatomic at a fixed geometry
must reproduce the frozen energy/charges/dipole — so parameter fits
cannot silently move ESTIMATED-element (Z > 8) physics. Regeneration is
an explicit step: tools/gen_element_fixtures.py (see its docstring).

Reference bar: tblite digit-stable tables for any Z <= 86 input
(/root/reference/src/methods/mqc_method_xtb.f90:58-296).
"""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "data",
                   "gfn1_element_fixtures.json")


@pytest.fixture(scope="module")
def fixtures():
    if not os.path.exists(FIX):
        pytest.skip("element fixtures not generated yet "
                    "(tools/gen_element_fixtures.py)")
    with open(FIX) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def evaluated(fixtures):
    """One padded batch over every fixture system (single compile)."""
    from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
    from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
    from metalquicha_tpu.methods.xtb.engine import settings_from_params

    calc = XtbCalculator(
        settings_from_params("gfn1", max_scf_iter=512, scf_tol=1e-11),
    )
    names = [n for n in fixtures if not n.startswith("_")]
    frags = []
    for n in names:
        spec = fixtures[n]
        r_b = spec["bond_angstrom"] * ANGSTROM_TO_BOHR
        coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r_b]])
        frags.append(
            (np.array(spec["numbers"]), coords, 0, spec["multiplicity"])
        )
    batch = calc.make_batch(frags)
    e, aux = calc.energies(batch)
    return names, np.asarray(e), aux


def test_all_elements_match_frozen_anchors(fixtures, evaluated):
    names, e, aux = evaluated
    charges = np.asarray(aux["charges"])
    dipoles = np.asarray(aux["dipole"])
    bad = []
    for k, n in enumerate(names):
        spec = fixtures[n]
        de = abs(e[k] - spec["energy_ha"])
        dq = np.abs(charges[k][:2] - np.array(spec["charges"])).max()
        dmu = np.abs(dipoles[k] - np.array(spec["dipole_au"])).max()
        if de > 1e-9 or dq > 1e-7 or dmu > 1e-7:
            bad.append((n, float(de), float(dq), float(dmu)))
    assert bad == [], (
        f"{len(bad)} element anchors moved (fit drift?); regenerate "
        f"deliberately via tools/gen_element_fixtures.py: {bad[:10]}"
    )


def test_fixture_coverage_spans_tabulated_elements(fixtures):
    from metalquicha_tpu.methods.xtb import params_gfn1 as pg

    have = {int(n[1:3]) for n in fixtures if not n.startswith("_")}
    missing = [z for z in pg.ELEMENTS if z not in have and z not in (1, 8)]
    # H and O appear as partners in every system; all others need anchors
    assert missing == []
