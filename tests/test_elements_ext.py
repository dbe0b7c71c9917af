"""Extended element coverage (Z=21..86): structure sanity + end-to-end runs.

The reference supports tblite's full GFN1 range Z<=86
(/root/reference/src/methods/mqc_method_xtb.f90:58-296); these tests pin
that every element RUNS here (coverage parity).  Values are ESTIMATED
(params_elements_ext.py) — no 1e-6 energy bar exists for them in-tree, so
the assertions are structural: finite energies, finite gradients, correct
valence electron counts, D3 tables well-formed.
"""

import numpy as np
import pytest

from metalquicha_tpu.methods.xtb import params_gfn1 as pg
from metalquicha_tpu.methods.xtb import dispersion_d3 as d3


def test_full_z_coverage_1_to_86():
    missing = [z for z in range(1, 87) if z not in pg.ELEMENTS]
    assert missing == []


def test_valence_electron_counts_match_group():
    # neutral-atom valence electrons = sum of reference occupations
    expected = {
        26: 8,   # Fe 3d6 4s2
        29: 11,  # Cu 3d10 4s1
        30: 2,   # Zn 4s2 (d in core)
        34: 6,   # Se 4s2 4p4
        46: 10,  # Pd 4d10
        57: 3,   # La 5d1 6s2 (f-in-core trivalent)
        71: 3,   # Lu
        79: 11,  # Au 5d10 6s1
        82: 4,   # Pb 6s2 6p2
        86: 8,   # Rn 6s2 6p6
    }
    for z, ne in expected.items():
        rec = pg.ELEMENTS[z]
        assert sum(rec.refocc) == ne, f"Z={z}"


def test_record_shapes_consistent():
    for z, rec in pg.ELEMENTS.items():
        n = len(rec.shells)
        for fieldname in ("ngauss", "levels", "slater", "refocc", "kcn",
                          "shpoly", "lgam"):
            assert len(getattr(rec, fieldname)) == n, (z, fieldname)
        assert all(s > 0 for s in rec.slater), z
        assert all(lv < 0 for lv in rec.levels), z
        assert rec.gam > 0 and rec.alpha > 0 and rec.zeff > 0, z


def test_d3_tables_cover_all_elements():
    for z in range(1, 87):
        cn_pad, c6_pad, n = d3._element_ref_arrays(z)
        assert n >= 1, z
        assert np.all(c6_pad[:n] > 0), z
        assert d3.R4R2[z] > 0, z
        assert pg.COVALENT_RADII_A[z] > 0, z


def test_ext_c6_fallback_matches_geometric_mean():
    # a core-core pair through the table equals the seed geometric mean
    # when no fitted override exists; an ext-ext pair must use the
    # sqrt-diagonal factorization producing the same structure.
    import jax.numpy as jnp

    numbers = np.array([26, 8], dtype=np.int64)  # Fe, O
    tabs = d3.build_d3_tables(numbers)
    assert tabs["zidx"][0] == -1 and tabs["zidx"][1] >= 0
    cn = jnp.asarray([2.0, 1.0])
    table = jnp.asarray(d3.full_pair_table())
    c6 = d3.c6_coefficients(
        cn, jnp.asarray(tabs["ref_cn"]), jnp.asarray(tabs["zidx"]),
        table, jnp.asarray(tabs["sqrtc6"]),
    )
    c6 = np.asarray(c6)
    assert np.all(np.isfinite(c6))
    # Fe-O C6 should be ~sqrt(C6_Fe * C6_O) at the interpolated refs
    w_fe = np.asarray(d3.ref_weights(cn, jnp.asarray(tabs["ref_cn"])))[0]
    s_fe = (w_fe * tabs["sqrtc6"][0]).sum()
    w_o = np.asarray(d3.ref_weights(cn, jnp.asarray(tabs["ref_cn"])))[1]
    s_o = (w_o * tabs["sqrtc6"][1]).sum()
    assert c6[0, 1] == pytest.approx(s_fe * s_o, rel=1e-6)
    assert c6[0, 1] > 10.0  # physically sized


@pytest.mark.parametrize("numbers,charge", [
    (np.array([26, 6, 8, 6, 8], dtype=np.int64), 0),   # Fe(CO)2 fragment
    (np.array([30, 8, 1, 1], dtype=np.int64), 0),      # Zn-water-like
    (np.array([78, 7, 1, 1, 1], dtype=np.int64), 0),   # Pt-ammonia-like
])
def test_heavy_element_single_point_runs(numbers, charge):
    from metalquicha_tpu.methods.xtb.calculator import XtbCalculator

    rng = np.random.default_rng(7)
    n = len(numbers)
    # loose, non-coincident geometry (Bohr)
    coords = 3.5 * rng.standard_normal((n, 3))
    coords[0] = 0.0
    calc = XtbCalculator()
    frag = calc.make_batch([(numbers, coords, charge, 1)])
    e, _aux = calc.energies(frag)
    assert np.isfinite(np.asarray(e)).all()
    e_val, g, _aux2 = calc.gradients(frag)
    assert np.isfinite(np.asarray(e_val)).all()
    assert np.isfinite(np.asarray(g)).all()
