"""ATM three-body dispersion term (dispersion_d3.atm_energy).

Reference parity: tblite evaluates the xTB dispersion through s-dftd3,
whose rational-damping path carries the triple-dipole (ATM) term; the
reference consumes it via tblite single points
(/root/reference/src/methods/mqc_method_xtb.f90:113-160). The term is a
pure 3-body atomic potential — it telescopes exactly through MBE(>=3)
weights, which is how its absence surfaced as the parameter-stationary
w20 MBE(4) residual (tools/exp_atm_scan.py).

The shipped gate: disp_s9 travels with the fitted overlay's globals, so
tables fitted without the term keep s9 = 0 until refitted.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metalquicha_tpu.methods.xtb.dispersion_d3 import (
    atm_energy,
    build_d3_tables,
    full_pair_table,
)

A1, A2 = 0.63, 5.0


def _tables(numbers):
    tab = build_d3_tables(np.asarray(numbers))
    return {
        "ref_cn": jnp.asarray(tab["ref_cn"]),
        "zidx": jnp.asarray(tab["zidx"]),
        "sqrtc6": jnp.asarray(tab["sqrtc6"]),
        "pair_table": jnp.asarray(np.asarray(full_pair_table(True))),
        "r4r2": jnp.asarray(tab["r4r2"]),
    }


def _loop_reference(coords, cn, numbers, s9, rs9, alp=16.0):
    """Independent O(N^3) python-loop ATM implementation."""
    from metalquicha_tpu.methods.xtb.dispersion_d3 import c6_coefficients

    tab = _tables(numbers)
    c6 = np.asarray(
        c6_coefficients(
            jnp.asarray(cn), tab["ref_cn"], tab["zidx"], tab["pair_table"],
            tab["sqrtc6"],
        )
    )
    r4r2 = np.asarray(tab["r4r2"])
    r0 = rs9 * (A1 * np.sqrt(3.0 * r4r2[:, None] * r4r2[None, :]) + A2)
    d = np.asarray(coords)
    r = np.linalg.norm(d[:, None] - d[None, :], axis=-1)
    e = 0.0
    for i, j, k in itertools.combinations(range(len(numbers)), 3):
        r2ij, r2jk, r2ik = r[i, j] ** 2, r[j, k] ** 2, r[i, k] ** 2
        rrr = r[i, j] * r[j, k] * r[i, k]
        c9 = np.sqrt(c6[i, j] * c6[j, k] * c6[i, k])
        ang = (
            0.375 * (r2ij + r2jk - r2ik) * (r2ij - r2jk + r2ik)
            * (-r2ij + r2jk + r2ik) / (r2ij * r2jk * r2ik) + 1.0
        )
        fd = 1.0 / (
            1.0 + 6.0 * ((r0[i, j] * r0[j, k] * r0[i, k]) / rrr) ** (alp / 3)
        )
        e += c9 * ang * fd / rrr**3
    return s9 * e


def _water_trimer():
    # three waters, O-O ~ 5.3 Bohr (H-bond range)
    base = np.array([[0.0, 0.0, 0.0], [1.8, 0.0, 0.6], [-0.6, 1.7, 0.0]])
    coords = np.concatenate(
        [base, base + [5.3, 0.0, 0.0], base + [2.6, 4.6, 0.0]]
    )
    numbers = np.array([8, 1, 1] * 3)
    return coords, numbers


def _cn(coords, numbers, mask=None):
    from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
    from metalquicha_tpu.methods.xtb import params_gfn1 as P
    from metalquicha_tpu.methods.xtb.engine import coordination_numbers

    rcov = (
        np.array([P.COVALENT_RADII_A[int(z)] for z in numbers])
        * ANGSTROM_TO_BOHR
    )
    if mask is None:
        mask = jnp.ones(len(numbers))
    return coordination_numbers(
        jnp.asarray(coords), jnp.asarray(rcov), mask, 16.0, "exp"
    )


def test_matches_loop_reference():
    coords, numbers = _water_trimer()
    cn = _cn(coords, numbers)
    got = float(
        atm_energy(
            jnp.asarray(coords), cn, _tables(numbers), jnp.ones(9),
            1.0, 0.65, A1, A2,
        )
    )
    want = _loop_reference(coords, cn, numbers, 1.0, 0.65)
    assert got == pytest.approx(want, rel=1e-12)
    assert got > 0.0  # compact cluster: net repulsive


def test_s9_linear_and_zero():
    coords, numbers = _water_trimer()
    cn = _cn(coords, numbers)
    tab = _tables(numbers)
    m = jnp.ones(9)
    e1 = float(atm_energy(jnp.asarray(coords), cn, tab, m, 1.0, 0.65, A1, A2))
    e2 = float(atm_energy(jnp.asarray(coords), cn, tab, m, 2.5, 0.65, A1, A2))
    e0 = float(atm_energy(jnp.asarray(coords), cn, tab, m, 0.0, 0.65, A1, A2))
    assert e2 == pytest.approx(2.5 * e1, rel=1e-12)
    assert e0 == 0.0


def test_angular_sign():
    """Near-linear triple attractive, equilateral repulsive (3cos+1 law)."""
    numbers = np.array([8, 8, 8])
    tab = _tables(numbers)
    m = jnp.ones(3)
    r = 6.0
    lin = jnp.asarray([[0.0, 0, 0], [r, 0, 0], [2 * r, 0, 0]])
    tri = jnp.asarray(
        [[0.0, 0, 0], [r, 0, 0], [r / 2, r * np.sqrt(3) / 2, 0]]
    )
    e_lin = float(atm_energy(lin, _cn(lin, numbers), tab, m, 1.0, 0.65, A1, A2))
    e_tri = float(atm_energy(tri, _cn(tri, numbers), tab, m, 1.0, 0.65, A1, A2))
    assert e_lin < 0.0 < e_tri


def test_padding_and_cap_guards():
    coords, numbers = _water_trimer()
    cn = _cn(coords, numbers)
    e_ref = float(
        atm_energy(
            jnp.asarray(coords), cn, _tables(numbers), jnp.ones(9),
            1.0, 0.65, A1, A2,
        )
    )
    # padded atoms (z=0, mask 0) at PAD_COORD_STEP-style offsets
    cpad = np.concatenate([coords, coords[-1] + [[1000.0, 0, 0], [2000.0, 0, 0]]])
    npad = np.concatenate([numbers, [0, 0]])
    mask = jnp.asarray(np.concatenate([np.ones(9), np.zeros(2)]))
    cn_p = _cn(cpad, npad, mask)
    e_pad = float(
        atm_energy(
            jnp.asarray(cpad), cn_p, _tables(npad), mask, 1.0, 0.65, A1, A2
        )
    )
    assert e_pad == pytest.approx(e_ref, abs=1e-14)

    # coincident H caps (GMBE gappy intersections): duplicated REAL atom
    # must not produce NaN/inf in energy or gradient
    ccap = np.concatenate([coords, coords[:1]])
    ncap = np.concatenate([numbers, [1]])
    mcap = jnp.ones(10)
    cn_c = _cn(ccap, ncap, mcap)
    tabs = _tables(ncap)
    e_cap = float(
        atm_energy(jnp.asarray(ccap), cn_c, tabs, mcap, 1.0, 0.65, A1, A2)
    )
    assert np.isfinite(e_cap)
    g = jax.grad(
        lambda c: atm_energy(c, cn_c, tabs, mcap, 1.0, 0.65, A1, A2)
    )(jnp.asarray(ccap))
    assert np.isfinite(np.asarray(g)).all()


def test_gradient_matches_fd():
    coords, numbers = _water_trimer()
    tab = _tables(numbers)
    m = jnp.ones(9)

    def e_of(c):
        return atm_energy(c, _cn(c, numbers), tab, m, 1.0, 0.65, A1, A2)

    g = np.asarray(jax.grad(e_of)(jnp.asarray(coords)))
    h = 1e-6
    for idx in [(0, 0), (3, 2), (7, 1)]:
        cp = coords.copy()
        cp[idx] += h
        ep = float(e_of(jnp.asarray(cp)))
        cp[idx] -= 2 * h
        em = float(e_of(jnp.asarray(cp)))
        assert g[idx] == pytest.approx((ep - em) / (2 * h), rel=1e-5)


def test_shipped_tables_keep_gate_closed():
    """Tables fitted without the term must keep s9 = 0 until refitted."""
    from metalquicha_tpu.methods.xtb.batch import GLB_FIELDS

    assert GLB_FIELDS.index("disp_s9") == 16
    assert GLB_FIELDS.index("disp_rs9") == 17
