"""GFN1 klight repulsion rule: light-light (Z<=2) pairs use a reduced
distance exponent (published 1.0), all other pairs the global kexp (1.5).

Reference parity: tblite's repulsion container carries (kexp, klight) and
selects klight when BOTH atoms are Z<=2; the reference consumes it through
new_gfn1_calculator (/root/reference/src/methods/mqc_method_xtb.f90:107).
The working klight value travels with the fitted overlay ("globals"
section) so tables and functional form stay paired.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metalquicha_tpu.methods.xtb.engine import (
    repulsion_energy,
    settings_from_params,
)


def _pair_energy(r, z1, z2, alpha, zeff, kexp, klight):
    coords = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, r]])
    mask = jnp.ones(2)
    light = jnp.asarray([1.0 if z1 <= 2 else 0.0, 1.0 if z2 <= 2 else 0.0])
    return float(
        repulsion_energy(
            coords, jnp.asarray(zeff), jnp.asarray(alpha), mask,
            kexp, 1.0, light_mask=light, klight=klight,
        )
    )


def test_hh_pair_uses_klight():
    r, a, z = 3.3, 2.2093, 1.1163
    got = _pair_energy(r, 1, 1, [a, a], [z, z], 1.5, 1.0)
    want = z * z / r * np.exp(-a * r)
    assert got == pytest.approx(want, rel=1e-12)
    # and it is NOT the uniform-kexp value (~400x smaller at this r)
    uniform = z * z / r * np.exp(-a * r**1.5)
    assert got > 50 * uniform


def test_heavy_pairs_unchanged_by_klight():
    r = 2.8
    a, z = [3.18, 2.23], [4.54, 1.12]  # O-H like
    with_rule = _pair_energy(r, 8, 1, a, z, 1.5, 1.0)
    without = _pair_energy(r, 8, 1, a, z, 1.5, None)
    assert with_rule == pytest.approx(without, rel=1e-14)


def test_klight_none_is_uniform_kexp():
    r, a, z = 3.3, 2.2093, 1.1163
    got = _pair_energy(r, 1, 1, [a, a], [z, z], 1.5, None)
    want = z * z / r * np.exp(-a * r**1.5)
    assert got == pytest.approx(want, rel=1e-12)


def test_settings_pick_up_overlay_klight():
    from metalquicha_tpu.methods.xtb import params_gfn1 as p

    old = getattr(p.GLOBALS, "klight", None)
    try:
        p.GLOBALS.klight = 1.0
        s = settings_from_params("gfn1")
        assert s.klight_rep == 1.0
    finally:
        p.GLOBALS.klight = old
