"""C++ host runtime equivalence + differentiable parameter rebuild tests."""

import numpy as np
import pytest

from metalquicha_tpu import native
from metalquicha_tpu.frag import combinatorics as comb
from metalquicha_tpu.frag import gmbe, mbe


def _py_enumerate(n, l):
    from itertools import combinations

    rows = []
    for k in range(1, l + 1):
        for c in combinations(range(n), k):
            row = np.full(l, -1, dtype=np.int64)
            row[: len(c)] = c
            rows.append(row)
    return np.stack(rows)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_enumeration_matches_python():
    for n, l in ((5, 1), (6, 2), (8, 3), (4, 4)):
        assert (native.enumerate_polymers(n, l) == _py_enumerate(n, l)).all()


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_weights_deltas_match_python():
    p = _py_enumerate(7, 3)
    rng = np.random.default_rng(0)
    e = rng.normal(size=len(p))
    # force the python path by calling the internals directly
    from itertools import combinations

    lookup = comb.build_lookup(p)
    w_py = np.zeros(len(p), dtype=np.int64)
    for row in p:
        mono = sorted(int(x) for x in row[row >= 0])
        for r in range(1, len(mono) + 1):
            for c in combinations(mono, r):
                w_py[lookup[c]] += (-1) ** (len(mono) - r)
    assert (native.mbe_weights(p) == w_py).all()
    d_native = native.mbe_deltas(p, e)
    assert abs(float(w_py @ e) - float(d_native.sum())) < 1e-10


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_pie_matches_python():
    rng = np.random.default_rng(3)
    prim = [np.unique(rng.integers(0, 15, size=7)) for _ in range(5)]
    sn, cn = native.pie_enumerate(prim)
    # python fallback path
    import metalquicha_tpu.native as nat

    orig = nat._LIB
    nat._LIB = None
    nat._TRIED = True
    try:
        sp, cp = gmbe.enumerate_pie_terms(prim)
    finally:
        nat._LIB = orig
    tn = {tuple(s): c for s, c in zip(sn, cn)}
    tp = {tuple(s): c for s, c in zip(sp, cp)}
    assert tn == tp


def test_param_rebuild_matches_host_builder():
    """FragmentSpec.rebuild(theta_init) must reproduce the host batch."""
    from metalquicha_tpu.methods.xtb.param_fit import FragmentSpec, theta_init
    from metalquicha_tpu.methods.xtb.calculator import single_point_energy
    from metalquicha_tpu.methods.xtb.engine import settings_from_params

    numbers = np.array([8, 1, 1, 6, 7, 1])
    coords = np.array(
        [
            [0.0, 0.0, 0.2],
            [0.0, 1.4, -0.9],
            [0.0, -1.4, -0.9],
            [4.0, 0.0, 0.0],
            [6.5, 0.5, 0.0],
            [8.2, 0.0, 0.5],
        ]
    )
    spec = FragmentSpec(numbers, coords, 0, 1)
    frag = spec.rebuild(theta_init("gfn1"))
    for name in (
        "sh_level", "sh_kcn", "sh_poly", "sh_eta",
        "prim_alpha", "prim_coeff", "at_gam3", "at_alpha", "at_zeff",
    ):
        a = np.asarray(getattr(frag, name))
        b = np.asarray(getattr(spec.base, name))
        assert np.abs(a - b).max() < 1e-12, name
    s = settings_from_params("gfn1")
    e1, _ = single_point_energy(spec.base.coords, spec.base, s)
    e2, _ = single_point_energy(frag.coords, frag, s)
    assert abs(float(e1) - float(e2)) < 1e-12


def test_param_jacobian_is_finite_and_sane():
    """d(E)/d(levels) for water ~ occupation numbers (band-dominated)."""
    import jax

    from metalquicha_tpu.methods.xtb.param_fit import FragmentSpec, theta_init
    from metalquicha_tpu.methods.xtb.calculator import single_point_energy
    from metalquicha_tpu.methods.xtb.engine import settings_from_params
    from metalquicha_tpu.methods.xtb.params_gfn1 import EV2AU

    numbers = np.array([8, 1, 1])
    coords = np.array([[0.0, 0.0, 0.2], [0.0, 1.4, -0.9], [0.0, -1.4, -0.9]])
    spec = FragmentSpec(numbers, coords, 0, 1)
    s = settings_from_params("gfn1")

    def e_of(theta):
        frag = spec.rebuild(theta)
        return single_point_energy(frag.coords, frag, s)[0]

    theta = theta_init("gfn1")
    grad = jax.grad(e_of)(theta)
    g_o_levels = np.asarray(grad["elements"][8]["levels"])
    assert np.isfinite(g_o_levels).all()
    # shifting O levels down must lower the energy; magnitude of order
    # (shell population) * eV->Ha
    assert (g_o_levels > 0.5 * EV2AU).all()
    assert (g_o_levels < 8.0 * EV2AU).all()
    # FD cross-check on one parameter
    h = 1e-4
    tp = theta_init("gfn1")
    tp["elements"][8]["levels"] = tp["elements"][8]["levels"].at[0].add(h)
    tm = theta_init("gfn1")
    tm["elements"][8]["levels"] = tm["elements"][8]["levels"].at[0].add(-h)
    fd = (float(e_of(tp)) - float(e_of(tm))) / (2 * h)
    assert fd == pytest.approx(float(g_o_levels[0]), rel=1e-4)
