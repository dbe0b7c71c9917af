"""Finite differences, vibrational analysis, thermochemistry tests.

Analytic fixtures: harmonic diatomic frequencies, quadratic-potential FD
Hessians, ideal-gas thermochemistry identities — mirroring the reference's
test_mqc_finite_differences / test_mqc_vibrational_analysis /
test_mqc_thermochemistry strategy.
"""

import math

import numpy as np
import pytest

from metalquicha_tpu.constants import (
    AU_TO_CM1,
    CM1_TO_KELVIN,
    KB_HARTREE,
    R_CALMOLK,
)
from metalquicha_tpu.numerics.finite_differences import (
    dipole_derivatives_from_dipoles,
    displaced_geometries,
    hessian_from_gradients,
)
from metalquicha_tpu.numerics.thermochemistry import (
    compute_thermochemistry,
    principal_moments,
)
from metalquicha_tpu.numerics.vibrational import compute_vibrational_analysis


def test_displaced_geometries_layout():
    coords = np.arange(6.0).reshape(2, 3)
    disp = displaced_geometries(coords, 0.01)
    assert disp.shape == (12, 2, 3)
    np.testing.assert_allclose(disp[0][0, 0], coords[0, 0] + 0.01)
    np.testing.assert_allclose(disp[1][0, 0], coords[0, 0] - 0.01)
    np.testing.assert_allclose(disp[10][1, 2], coords[1, 2] + 0.01)
    # all other entries untouched
    np.testing.assert_allclose(disp[0][1], coords[1])


def test_fd_hessian_exact_for_quadratic():
    """Central differences are exact for a quadratic potential."""
    rng = np.random.default_rng(0)
    n = 3
    A = rng.normal(size=(3 * n, 3 * n))
    K = A + A.T  # symmetric Hessian

    def grad(coords):
        return (K @ coords.ravel()).reshape(n, 3)

    coords = rng.normal(size=(n, 3))
    h = 0.005
    disp = displaced_geometries(coords, h)
    grads = np.stack([grad(c) for c in disp])
    H = hessian_from_gradients(grads, h)
    np.testing.assert_allclose(H, K, atol=1e-9)


def test_dipole_derivatives_fd():
    M = np.random.default_rng(1).normal(size=(3, 6))

    def dipole(coords):
        return M @ coords.ravel()

    coords = np.zeros((2, 3))
    disp = displaced_geometries(coords, 0.01)
    dips = np.stack([dipole(c) for c in disp])
    D = dipole_derivatives_from_dipoles(dips, 0.01)
    np.testing.assert_allclose(D, M, atol=1e-10)


def harmonic_diatomic(k=0.5, m1=1.008, m2=18.998, r0=1.7):
    """Analytic Cartesian Hessian of a harmonic bond along x."""
    numbers = np.array([1, 9])
    coords = np.array([[0.0, 0, 0], [r0, 0, 0]])
    H = np.zeros((6, 6))
    # d2E/dx2 blocks for bond along x
    H[0, 0] = H[3, 3] = k
    H[0, 3] = H[3, 0] = -k
    return numbers, coords, H


def test_diatomic_frequency_matches_analytic():
    k = 0.5
    numbers, coords, H = harmonic_diatomic(k=k)
    vib = compute_vibrational_analysis(H, numbers, coords)
    freqs = vib.frequencies
    # one real stretch; the rest ~0 (projection removes 5 for linear)
    assert (np.abs(freqs[:-1]) < 1e-3).all()
    from metalquicha_tpu.elements import element_mass

    m1, m2 = element_mass(1), element_mass(9)
    mu = 1.0 / (1.0 / m1 + 1.0 / m2)
    expected = math.sqrt(k / mu * AU_TO_CM1)
    assert freqs[-1] == pytest.approx(expected, rel=1e-9)
    # reduced mass in the Gaussian convention (1/sum(l^2/m), l normalized in
    # mass-weighted coords): m1 m2 (m1+m2) / (m1^2 + m2^2)
    mu_gaussian = m1 * m2 * (m1 + m2) / (m1**2 + m2**2)
    assert vib.reduced_masses[-1] == pytest.approx(mu_gaussian, rel=1e-6)


def test_vibrational_projection_removes_trans_rot():
    """A rigid-translation Hessian row pattern must not produce modes."""
    rng = np.random.default_rng(2)
    numbers = np.array([8, 1, 1])
    coords = rng.normal(size=(3, 3))
    # random PSD Hessian projected to be translation invariant already
    B = rng.normal(size=(9, 9))
    H = B @ B.T
    vib = compute_vibrational_analysis(H, numbers, coords, project=True)
    # 6 near-zero modes from the projection of a nonlinear molecule:
    # the projected Hessian has >= 6 null directions (numerical zeros
    # amplify under sqrt(lambda * AU_TO_CM1), hence the 1 cm^-1 floor)
    assert (np.abs(vib.frequencies) > 1.0).sum() <= 3


def test_principal_moments_water_linear_detection():
    # linear CO2-like arrangement
    numbers = np.array([8, 6, 8])
    coords = np.array([[-2.2, 0, 0], [0.0, 0, 0], [2.2, 0, 0]])
    m = principal_moments(numbers, coords)
    assert m[0] == pytest.approx(0.0, abs=1e-9)
    thermo = compute_thermochemistry(
        np.array([700.0, 700.0, 1400.0, 2400.0]), numbers, coords
    )
    assert thermo.is_linear


def test_thermochemistry_identities_water():
    numbers = np.array([8, 1, 1])
    coords = np.array(
        [[0.0, 0.0, 0.22], [0.0, 1.43, -0.89], [0.0, -1.43, -0.89]]
    )
    freqs = np.array([1600.0, 3650.0, 3750.0])
    th = compute_thermochemistry(freqs, numbers, coords, temperature=298.15)
    assert not th.is_linear
    # ZPE = 1/2 sum(h nu)
    zpe_expected = 0.5 * (freqs * CM1_TO_KELVIN * KB_HARTREE).sum()
    assert th.zpe_hartree == pytest.approx(zpe_expected, rel=1e-12)
    # corrections: E = ZPE + 3/2RT + 3/2RT + Evib; H = E + RT
    kT = KB_HARTREE * 298.15
    assert th.thermal_correction_enthalpy - th.thermal_correction_energy == (
        pytest.approx(kT, rel=1e-12)
    )
    # G = H - T*S
    s_total_ha = (
        (th.S_trans + th.S_rot + th.S_vib + th.S_elec) / R_CALMOLK * KB_HARTREE
    )
    assert th.thermal_correction_gibbs == pytest.approx(
        th.thermal_correction_enthalpy - 298.15 * s_total_ha, rel=1e-12
    )
    # translational entropy of water vapor at 298 K, 1 atm ~ 34.6 cal/mol/K
    assert th.S_trans == pytest.approx(34.6, abs=0.2)
    # classical values
    assert th.Cv_trans == pytest.approx(1.5 * R_CALMOLK)
    assert th.Cv_rot == pytest.approx(1.5 * R_CALMOLK)
    # high-frequency modes barely contribute at room temperature
    assert th.E_vib < 1e-3
    assert th.q_vib == pytest.approx(1.0, abs=1e-2)


def test_imaginary_and_low_frequencies_skipped():
    numbers = np.array([8, 1, 1])
    coords = np.array(
        [[0.0, 0.0, 0.22], [0.0, 1.43, -0.89], [0.0, -1.43, -0.89]]
    )
    freqs = np.array([-500.0, 5.0, 1600.0, 3650.0, 3750.0])
    th = compute_thermochemistry(freqs, numbers, coords)
    assert th.n_imag_freqs == 1
    assert th.n_real_freqs == 3  # 5 cm^-1 below the 10 cm^-1 floor
    zpe_expected = 0.5 * (
        np.array([1600.0, 3650.0, 3750.0]) * CM1_TO_KELVIN * KB_HARTREE
    ).sum()
    assert th.zpe_hartree == pytest.approx(zpe_expected, rel=1e-12)
