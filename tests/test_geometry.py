"""Fragment building, H-capping and cap derivative redistribution tests.

Mirrors reference test/test_mqc_physical_fragment.f90 coverage: cap counting
(XOR over broken bonds), cap placement at the excluded atom, charge and
multiplicity composition rules, duplicate-atom validation, distance metric,
and gradient/Hessian scatter with caps.
"""

import numpy as np
import pytest

from metalquicha_tpu.constants import BOHR_TO_ANGSTROM
from metalquicha_tpu.errors import InputError
from metalquicha_tpu.geometry import (
    Bond,
    SystemGeometry,
    build_fragment_from_atom_list,
    build_fragment_from_indices,
    min_inter_monomer_distance,
    redistribute_gradient,
    redistribute_hessian,
    validate_min_distances,
)


def two_waters():
    """Two waters, 3 Bohr apart on x."""
    numbers = [8, 1, 1, 8, 1, 1]
    coords = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.8, 0.0, 0.0],
            [-0.5, 1.7, 0.0],
            [5.0, 0.0, 0.0],
            [6.8, 0.0, 0.0],
            [4.5, 1.7, 0.0],
        ]
    )
    return SystemGeometry(
        numbers=numbers,
        coords=coords,
        charge=0,
        multiplicity=1,
        fragment_atoms=[np.array([0, 1, 2]), np.array([3, 4, 5])],
        fragment_charges=[0, 0],
        fragment_multiplicities=[1, 1],
    )


def chain_with_broken_bond():
    """4-atom chain, bond 1-2 broken, monomers {0,1} and {2,3}."""
    numbers = [6, 6, 6, 6]
    coords = np.array(
        [[0.0, 0, 0], [2.0, 0, 0], [4.0, 0, 0], [6.0, 0, 0]]
    )
    return SystemGeometry(
        numbers=numbers,
        coords=coords,
        fragment_atoms=[np.array([0, 1]), np.array([2, 3])],
        fragment_charges=[0, 0],
        fragment_multiplicities=[1, 1],
        bonds=[Bond(0, 1), Bond(1, 2, is_broken=True), Bond(2, 3)],
    )


def test_monomer_fragment():
    sys_geom = two_waters()
    frag = build_fragment_from_indices(sys_geom, [0])
    assert frag.n_total == 3
    assert frag.n_caps == 0
    assert frag.charge == 0
    assert frag.multiplicity == 1
    assert frag.n_electrons == 10
    assert frag.distance == 0.0
    np.testing.assert_array_equal(frag.local_to_global, [0, 1, 2])


def test_dimer_fragment_charge_and_distance():
    sys_geom = two_waters()
    sys_geom.fragment_charges = [1, -1]
    frag = build_fragment_from_indices(sys_geom, [0, 1])
    assert frag.n_total == 6
    assert frag.charge == 0  # sum of fragment charges
    # closest inter-monomer pair is atom 1 (1.8,0,0) vs atom 5 (4.5,1.7,0)
    assert frag.distance == pytest.approx(np.sqrt(10.18) * BOHR_TO_ANGSTROM)


def test_nmer_multiplicity_uses_system():
    sys_geom = two_waters()
    sys_geom.multiplicity = 3
    sys_geom.fragment_multiplicities = [2, 2]
    mono = build_fragment_from_indices(sys_geom, [0])
    assert mono.multiplicity == 2  # monomer keeps its own
    dimer = build_fragment_from_indices(sys_geom, [0, 1])
    assert dimer.multiplicity == 3  # n-mer takes the system's


def test_hydrogen_capping_places_h_at_excluded_atom():
    sys_geom = chain_with_broken_bond()
    frag = build_fragment_from_indices(sys_geom, [0])
    # broken bond 1-2 crosses the boundary: one cap
    assert frag.n_caps == 1
    assert frag.n_total == 3
    assert frag.numbers[-1] == 1  # hydrogen cap
    np.testing.assert_array_equal(frag.cap_replaces_atom, [2])
    # cap sits AT the excluded atom's position
    np.testing.assert_allclose(frag.coords[-1], sys_geom.coords[2])
    # electrons: C2 H cap, charge 0 => 6+6+1 = 13
    assert frag.n_electrons == 13


def test_capping_xor_no_cap_when_both_inside():
    sys_geom = chain_with_broken_bond()
    frag = build_fragment_from_indices(sys_geom, [0, 1])
    assert frag.n_caps == 0  # both endpoints of the broken bond inside


def test_fragment_from_atom_list_neutral_singlet():
    sys_geom = chain_with_broken_bond()
    sys_geom.charge = 2
    sys_geom.multiplicity = 3
    frag = build_fragment_from_atom_list(sys_geom, [1, 2])
    assert frag.charge == 0
    assert frag.multiplicity == 1
    assert frag.n_caps == 0  # bond 1-2 fully inside


def test_duplicate_atoms_rejected():
    coords = np.array([[0.0, 0, 0], [0.005, 0, 0]])
    with pytest.raises(InputError):
        validate_min_distances(coords)


def test_min_inter_monomer_distance_multi():
    sys_geom = two_waters()
    d = min_inter_monomer_distance(sys_geom, np.array([0, 1]))
    assert d == pytest.approx(np.sqrt(10.18) * BOHR_TO_ANGSTROM)
    assert min_inter_monomer_distance(sys_geom, np.array([0])) == 0.0


def test_gradient_redistribution_with_caps():
    sys_geom = chain_with_broken_bond()
    frag = build_fragment_from_indices(sys_geom, [0])  # atoms 0,1 + cap->2
    grad_frag = np.array([[1.0, 0, 0], [2.0, 0, 0], [4.0, 0, 0]])
    grad_sys = np.zeros((4, 3))
    redistribute_gradient(frag, grad_frag, grad_sys)
    np.testing.assert_allclose(grad_sys[:, 0], [1.0, 2.0, 4.0, 0.0])
    # scaled accumulate
    redistribute_gradient(frag, grad_frag, grad_sys, scale=-1.0)
    np.testing.assert_allclose(grad_sys, 0.0)


def test_hessian_redistribution_with_caps():
    sys_geom = chain_with_broken_bond()
    frag = build_fragment_from_indices(sys_geom, [0])
    m = frag.n_total
    rng = np.random.default_rng(0)
    h_frag = rng.normal(size=(3 * m, 3 * m))
    h_frag = h_frag + h_frag.T
    h_sys = np.zeros((12, 12))
    redistribute_hessian(frag, h_frag, h_sys)
    # total sum is conserved
    assert h_sys.sum() == pytest.approx(h_frag.sum())
    # cap block (fragment row 2) landed on system atom 2
    np.testing.assert_allclose(h_sys[6:9, 6:9], h_frag[6:9, 6:9])
    # system stays symmetric
    np.testing.assert_allclose(h_sys, h_sys.T)
