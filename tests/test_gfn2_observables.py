"""GFN2 cross-checks beyond the single w1_vib_therm calibration target.

The in-tree reference ground truth for GFN2 is one molecule
(w1_vib_therm); these tests pin *calibration-independent* invariances of
the AES/D4 machinery — properties that must hold for ANY correct GFN2
implementation regardless of element-constant values:

 - size consistency: E(two far-separated waters) == 2 E(water) — the
   damped multipole kernels, CAMM moments and charge-scaled dispersion
   must all vanish across the gap and the SCC must decouple;
 - rotational invariance of the energy and covariance of gradient and
   dipole — the anisotropic electrostatics (dipole/quadrupole integrals,
   traceless projection, Fock contributions) are the terms that break
   first if any frame-dependence sneaks in.
"""

import numpy as np
import pytest

from metalquicha_tpu.constants import ANGSTROM_TO_BOHR

WATER_A = np.array(
    [[0.0, 0.0, 0.0], [0.0, 0.0, 0.9572], [0.9239, 0.0, -0.2399]]
)


@pytest.fixture(scope="module")
def gfn2_calc():
    from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
    from metalquicha_tpu.methods.xtb.engine import settings_from_params

    return XtbCalculator(
        settings_from_params("gfn2", multipoles=True), variant="gfn2"
    )


def test_gfn2_size_consistency(gfn2_calc):
    z = np.array([8, 1, 1])
    c1 = WATER_A * ANGSTROM_TO_BOHR
    mono = gfn2_calc.make_batch([(z, c1, 0, 1)])
    e1, _ = gfn2_calc.energies(mono)
    e1 = float(np.asarray(e1)[0])

    # 1000 Bohr: even the physical dipole-dipole tail (mu^2/r^3, the
    # SLOWEST-decaying real interaction between neutral waters — at 80 Bohr
    # it is still ~1e-6 Ha!) is below 1e-9
    c2 = c1 + np.array([1000.0, 0.0, 0.0])
    dimer = gfn2_calc.make_batch(
        [(np.concatenate([z, z]), np.vstack([c1, c2]), 0, 1)]
    )
    e2, aux = gfn2_calc.energies(dimer)
    e2 = float(np.asarray(e2)[0])
    assert float(np.asarray(aux["scf_residual"])[0]) < 1e-8
    assert e2 == pytest.approx(2.0 * e1, abs=5e-9)


def test_gfn2_rotational_invariance_and_covariance(gfn2_calc):
    z = np.array([8, 1, 1])
    c = WATER_A * ANGSTROM_TO_BOHR
    # a non-trivial rotation (two axes)
    a, b = 0.7, 1.1
    rz = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    )
    rx = np.array(
        [[1, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]]
    )
    R = rx @ rz

    f0 = gfn2_calc.make_batch([(z, c, 0, 1)])
    e0, g0, aux0 = gfn2_calc.gradients(f0)
    f1 = gfn2_calc.make_batch([(z, c @ R.T, 0, 1)])
    e1, g1, aux1 = gfn2_calc.gradients(f1)

    e0 = float(np.asarray(e0)[0])
    e1 = float(np.asarray(e1)[0])
    assert e1 == pytest.approx(e0, abs=1e-9)

    g0 = np.asarray(g0)[0][:3]
    g1 = np.asarray(g1)[0][:3]
    # gradient must rotate with the frame
    np.testing.assert_allclose(g1, g0 @ R.T, atol=1e-8)

    d0 = np.asarray(aux0["dipole"])[0]
    d1 = np.asarray(aux1["dipole"])[0]
    np.testing.assert_allclose(d1, R @ d0, atol=1e-8)
    # water dipole must be physically sized (GFN2 gives ~0.6-1.0 a.u.)
    assert 0.3 < np.linalg.norm(d0) < 1.5
