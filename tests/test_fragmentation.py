"""Fragmentation math tests with synthetic energies (no chemistry).

Mirrors the reference strategy (test_mqc_mbe.f90): hand-set fragment
energies verify the delta-assembly identities and order independence;
PIE enumeration is checked against hand-computable overlaps.
"""

import numpy as np
import pytest

from metalquicha_tpu.frag.combinatorics import (
    binomial,
    build_lookup,
    enumerate_polymers,
    get_nfrags,
    polymer_levels,
    subset_index_table,
)
from metalquicha_tpu.frag.gmbe import (
    compute_gmbe_pie,
    enumerate_pie_terms,
    primary_atom_sets,
)
from metalquicha_tpu.frag.mbe import compute_mbe, mbe_deltas, mbe_weights
from metalquicha_tpu.frag.screening import apply_distance_screening
from metalquicha_tpu.geometry import SystemGeometry, build_fragment_from_indices


def test_binomial_and_counts():
    assert binomial(20, 4) == 4845
    assert binomial(5, 0) == 1
    assert binomial(3, 5) == 0
    assert get_nfrags(6, 2) == 6 + 15
    assert get_nfrags(20, 4) == 20 + 190 + 1140 + 4845


def test_enumerate_polymers_shapes():
    p = enumerate_polymers(4, 2)
    assert p.shape == (10, 2)
    assert (polymer_levels(p) == [1, 1, 1, 1, 2, 2, 2, 2, 2, 2]).all()
    lookup = build_lookup(p)
    assert lookup[(0, 2)] == 5


def synthetic_energies(polymers, pair_coupling=0.01, triple_coupling=0.001):
    """E(S) = sum_i e_i + pair terms + triple terms — known exact MBE."""
    rng = np.random.default_rng(42)
    e_mono = rng.normal(-10.0, 1.0, size=16)

    def energy_of(monomers):
        monomers = sorted(monomers)
        e = sum(e_mono[m] for m in monomers)
        for i in range(len(monomers)):
            for j in range(i + 1, len(monomers)):
                e += pair_coupling * (monomers[i] + 1) * (monomers[j] + 1)
        for i in range(len(monomers)):
            for j in range(i + 1, len(monomers)):
                for k in range(j + 1, len(monomers)):
                    e += triple_coupling * (
                        monomers[i] + monomers[j] + monomers[k] + 1
                    )
        return e

    return np.array(
        [energy_of([int(x) for x in row[row >= 0]]) for row in polymers]
    ), energy_of


def test_mbe2_exact_for_pairwise_system():
    """MBE(2) is exact when the energy has only 1- and 2-body terms."""
    M = 5
    p = enumerate_polymers(M, 2)
    energies, energy_of = synthetic_energies(p, triple_coupling=0.0)
    deltas = mbe_deltas(p, energies)
    weights = mbe_weights(p)
    total_w = float(weights @ energies)
    total_d = float(deltas.sum())
    exact = energy_of(list(range(M)))
    assert total_w == pytest.approx(exact, abs=1e-10)
    assert total_d == pytest.approx(exact, abs=1e-10)


def test_mbe3_captures_three_body():
    M = 5
    p2 = enumerate_polymers(M, 2)
    p3 = enumerate_polymers(M, 3)
    e2, energy_of = synthetic_energies(p2)
    e3, _ = synthetic_energies(p3)
    exact = energy_of(list(range(M)))
    total2 = float(mbe_weights(p2) @ e2)
    total3 = float(mbe_weights(p3) @ e3)
    assert total3 == pytest.approx(exact, abs=1e-10)  # 3-body complete
    assert abs(total2 - exact) > 1e-6  # 2-body misses triples


def test_full_expansion_telescopes_to_supersystem():
    M = 4
    p = enumerate_polymers(M, M)
    energies, energy_of = synthetic_energies(p)
    # add an arbitrary non-additive perturbation: MBE to level M is always
    # exact for the supersystem energy by telescoping
    rng = np.random.default_rng(1)
    energies = energies + rng.normal(0, 0.1, size=len(energies))
    full_idx = build_lookup(p)[tuple(range(M))]
    deltas = mbe_deltas(p, energies)
    assert deltas.sum() == pytest.approx(energies[full_idx], abs=1e-10)
    assert float(mbe_weights(p) @ energies) == pytest.approx(
        energies[full_idx], abs=1e-10
    )


def test_order_independence():
    M = 5
    p = enumerate_polymers(M, 3)
    energies, _ = synthetic_energies(p)
    total = float(mbe_weights(p) @ energies)
    rng = np.random.default_rng(7)
    for _ in range(3):
        perm = rng.permutation(len(p))
        total_p = float(mbe_weights(p[perm]) @ energies[perm])
        assert total_p == pytest.approx(total, abs=1e-12)
        assert mbe_deltas(p[perm], energies[perm]).sum() == pytest.approx(
            total, abs=1e-12
        )


def test_subset_table_closure_validation():
    p = enumerate_polymers(3, 2)
    subsets, counts = subset_index_table(p)
    assert counts.tolist() == [0, 0, 0, 2, 2, 2]
    # dimers' subsets point at the right monomers
    lookup = build_lookup(p)
    i01 = lookup[(0, 1)]
    assert set(subsets[i01][: counts[i01]]) == {lookup[(0,)], lookup[(1,)]}
    # break closure -> error
    with pytest.raises(ValueError):
        subset_index_table(p[1:])


def three_waters_line(spacing=3.0):
    """Three waters on a line, `spacing` Bohr O-O."""
    w = np.array([[0.0, 0.0, 0.0], [1.5, 0.2, 0.0], [-0.4, 1.4, 0.0]])
    coords = np.concatenate([w + [i * spacing, 0, 0] for i in range(3)])
    return SystemGeometry(
        numbers=[8, 1, 1] * 3,
        coords=coords,
        fragment_atoms=[np.arange(3 * i, 3 * i + 3) for i in range(3)],
        fragment_charges=[0, 0, 0],
        fragment_multiplicities=[1, 1, 1],
    )


def test_distance_screening_with_closure():
    sys_geom = three_waters_line(spacing=10.0)  # ~5.29 A between neighbors
    p = enumerate_polymers(3, 3)
    # cutoff 6 A at level 2: pairs (0,2) at ~10.6 A drop; trimer contains
    # that far pair as a subset -> also dropped (closure)
    screened = apply_distance_screening(p, sys_geom, {2: 6.0})
    keys = {tuple(sorted(int(x) for x in row[row >= 0])) for row in screened}
    assert keys == {(0,), (1,), (2,), (0, 1), (1, 2)}
    # no cutoffs: unchanged
    assert apply_distance_screening(p, sys_geom, {}).shape == p.shape


def test_mbe_gradient_assembly_telescopes():
    """Complete MBE(2) of a 2-monomer system == dimer result exactly."""
    sys_geom = three_waters_line()
    sys_geom.fragment_atoms = sys_geom.fragment_atoms[:2]
    sys_geom.fragment_charges = [0, 0]
    sys_geom.fragment_multiplicities = [1, 1]
    sys_geom = SystemGeometry(
        numbers=sys_geom.numbers[:6],
        coords=sys_geom.coords[:6],
        fragment_atoms=sys_geom.fragment_atoms,
        fragment_charges=[0, 0],
        fragment_multiplicities=[1, 1],
    )
    p = enumerate_polymers(2, 2)
    frags = [build_fragment_from_indices(sys_geom, row[row >= 0]) for row in p]
    rng = np.random.default_rng(3)
    energies = rng.normal(size=3)
    grads = [rng.normal(size=(f.n_total, 3)) for f in frags]
    res = compute_mbe(p, sys_geom, frags, energies, gradients=grads)
    # telescoping: total = dimer quantity exactly
    dimer_idx = 2
    assert res.total_energy == pytest.approx(energies[dimer_idx])
    expected = np.zeros((6, 3))
    expected[frags[dimer_idx].local_to_global] = grads[dimer_idx]
    np.testing.assert_allclose(res.gradient, expected, atol=1e-12)
    # per-level sums add to the total
    assert res.sum_by_level.sum() == pytest.approx(res.total_energy)


# ---------------------------------------------------------------------------
# GMBE / PIE
# ---------------------------------------------------------------------------


def test_pie_two_overlapping_sets():
    prim = [np.array([0, 1, 2]), np.array([2, 3, 4])]
    atom_sets, coeffs = enumerate_pie_terms(prim)
    table = {tuple(s): c for s, c in zip(atom_sets, coeffs)}
    assert table == {(0, 1, 2): 1, (2, 3, 4): 1, (2,): -1}


def test_pie_three_set_chain():
    prim = [np.array([0, 1]), np.array([1, 2]), np.array([2, 3])]
    atom_sets, coeffs = enumerate_pie_terms(prim)
    table = {tuple(s): c for s, c in zip(atom_sets, coeffs)}
    # A, B, C primaries; A^B={1}, B^C={2}; A^C empty; A^B^C empty
    assert table == {(0, 1): 1, (1, 2): 1, (2, 3): 1, (1,): -1, (2,): -1}


def test_pie_three_common_atom_merges_coefficients():
    prim = [np.array([0, 9]), np.array([1, 9]), np.array([2, 9])]
    atom_sets, coeffs = enumerate_pie_terms(prim)
    table = {tuple(s): c for s, c in zip(atom_sets, coeffs)}
    # pairwise intersections {9} three times (-1 each) + triple (+1) => -2
    assert table[(9,)] == -2
    assert sum(table.values()) == 1  # chi of a connected cover


def test_pie_disjoint_partition_is_plain_sum():
    prim = [np.array([0, 1]), np.array([2, 3])]
    atom_sets, coeffs = enumerate_pie_terms(prim)
    assert len(atom_sets) == 2
    assert (coeffs == 1).all()


def test_pie_depth_cap():
    prim = [np.array([0, 9]), np.array([1, 9]), np.array([2, 9])]
    _, coeffs_full = enumerate_pie_terms(prim, max_intersection_level=999)
    atom_sets2, coeffs2 = enumerate_pie_terms(prim, max_intersection_level=2)
    table2 = {tuple(s): c for s, c in zip(atom_sets2, coeffs2)}
    assert table2[(9,)] == -3  # triple clique excluded by the cap


def test_pie_counting_identity():
    """PIE with E(S) = |S| must give |union| exactly."""
    rng = np.random.default_rng(5)
    prim = [np.unique(rng.integers(0, 12, size=6)) for _ in range(4)]
    atom_sets, coeffs = enumerate_pie_terms(prim)
    total = sum(c * len(s) for s, c in zip(atom_sets, coeffs))
    union = len(set(int(a) for s in prim for a in s))
    assert total == union


def test_primary_atom_sets_and_gmbe_accumulation():
    sys_geom = three_waters_line()
    p = enumerate_polymers(3, 1)
    prim = primary_atom_sets(sys_geom, p)
    assert [len(s) for s in prim] == [3, 3, 3]
    atom_sets, coeffs = enumerate_pie_terms(prim)
    # disjoint monomers: GMBE(1) == plain sum
    from metalquicha_tpu.geometry import build_fragment_from_atom_list

    frags = [build_fragment_from_atom_list(sys_geom, s) for s in atom_sets]
    energies = np.array([-1.0, -2.0, -3.0])
    res = compute_gmbe_pie(sys_geom, frags, coeffs, energies)
    assert res.total_energy == pytest.approx(-6.0)
    assert all(f.charge == 0 and f.multiplicity == 1 for f in frags)
