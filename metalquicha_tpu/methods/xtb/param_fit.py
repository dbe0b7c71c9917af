"""Differentiable parameterization: xTB energies as functions of the
parameter vector theta.

The engine's variational energy functional is stationary in the converged
charges, so jax.jacrev through it gives EXACT parameter Jacobians
d(energy)/d(theta) in one backward pass — the machinery used to reconstruct
the GFN1/GFN2 element tables against the reference validation energies
(inverse parameterization), and generally useful for refitting xTB to new
data.

theta layout (per fitted element, all jnp scalars/vectors):
    levels (eV), slater, kcn (eV), shpoly, gam, lgam, gam3, alpha, zeff
plus globals: ksp, kpol, ken.

Structure arrays (masks, indices, refocc, radii, D3 tables) stay fixed from
the host-side builder; only theta-dependent arrays are rebuilt in jnp.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...constants import KB_HARTREE
from . import params_gfn1
from .basis import CARTESIAN_COMPONENTS, STO_NG
from .batch import build_batch
from .calculator import FragmentData, fragment_data_from_batch
from .engine import EngineSettings
from .params_gfn1 import EV2AU

FITTED_Z = (1, 6, 7, 8)

ELEMENT_FIELDS = (
    "levels", "slater", "kcn", "shpoly", "lgam",  # per-shell vectors
    "gam", "gam3", "alpha", "zeff",               # scalars
)
GLOBAL_FIELDS = ("ksp", "kpol", "ken")


def theta_init(variant: str = "gfn1") -> dict:
    """Current parameter tables as a theta pytree."""
    params = params_gfn1 if variant == "gfn1" else __import__(
        "metalquicha_tpu.methods.xtb.params_gfn2", fromlist=["x"]
    )
    theta = {"elements": {}, "globals": {}}
    for z in FITTED_Z:
        rec = params.get_element(z)
        theta["elements"][z] = {
            "levels": jnp.asarray(rec.levels, dtype=jnp.float64),
            "slater": jnp.asarray(rec.slater, dtype=jnp.float64),
            "kcn": jnp.asarray(rec.kcn, dtype=jnp.float64),
            "shpoly": jnp.asarray(rec.shpoly, dtype=jnp.float64),
            "lgam": jnp.asarray(rec.lgam, dtype=jnp.float64),
            "gam": jnp.asarray(rec.gam, dtype=jnp.float64),
            "gam3": jnp.asarray(rec.gam3, dtype=jnp.float64),
            "alpha": jnp.asarray(rec.alpha, dtype=jnp.float64),
            "zeff": jnp.asarray(rec.zeff, dtype=jnp.float64),
        }
    g = params.GLOBALS
    theta["globals"] = {
        "ksp": jnp.asarray(g.ksp, dtype=jnp.float64),
        "kpol": jnp.asarray(g.kpol, dtype=jnp.float64),
        "ken": jnp.asarray(g.ken, dtype=jnp.float64),
    }
    return theta


def theta_to_tables(theta: dict, variant: str = "gfn1") -> dict:
    """Write theta values back into the parameter module (host-side)."""
    params = params_gfn1 if variant == "gfn1" else __import__(
        "metalquicha_tpu.methods.xtb.params_gfn2", fromlist=["x"]
    )
    for z in FITTED_Z:
        rec = params.ELEMENTS[z]
        el = theta["elements"][z]
        object.__setattr__(rec, "levels", tuple(np.asarray(el["levels"])))
        object.__setattr__(rec, "slater", tuple(np.asarray(el["slater"])))
        object.__setattr__(rec, "kcn", tuple(np.asarray(el["kcn"])))
        object.__setattr__(rec, "shpoly", tuple(np.asarray(el["shpoly"])))
        object.__setattr__(rec, "lgam", tuple(np.asarray(el["lgam"])))
        object.__setattr__(rec, "gam", float(el["gam"]))
        object.__setattr__(rec, "gam3", float(el["gam3"]))
        object.__setattr__(rec, "alpha", float(el["alpha"]))
        object.__setattr__(rec, "zeff", float(el["zeff"]))
    params.GLOBALS.ksp = float(theta["globals"]["ksp"])
    params.GLOBALS.kpol = float(theta["globals"]["kpol"])
    params.GLOBALS.ken = float(theta["globals"]["ken"])


# ---------------------------------------------------------------------------
# jnp basis rebuild (differentiable in the slater exponents)
# ---------------------------------------------------------------------------


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _cgto_from_zeta(ngauss: int, n: int, l: int, zeta):
    """STO-nG expansion with jnp zeta; returns (alphas, coeffs) normalized."""
    a_tab, c_tab = STO_NG[(ngauss, n, l)]
    a_tab = jnp.asarray(a_tab, dtype=zeta.dtype)
    c_tab = jnp.asarray(c_tab, dtype=zeta.dtype)
    alphas = a_tab * zeta * zeta
    s = (
        2.0
        * jnp.sqrt(alphas[:, None] * alphas[None, :])
        / (alphas[:, None] + alphas[None, :])
    ) ** (l + 1.5)
    norm = jnp.sqrt(c_tab @ s @ c_tab)
    return alphas, c_tab / norm


def _ortho(alphas_v, coeffs_v, alphas_p, coeffs_p, l: int):
    s_vp = (
        2.0
        * jnp.sqrt(alphas_v[:, None] * alphas_p[None, :])
        / (alphas_v[:, None] + alphas_p[None, :])
    ) ** (l + 1.5)
    ovlp = coeffs_v @ s_vp @ coeffs_p
    alphas = jnp.concatenate([alphas_p, alphas_v])
    coeffs = jnp.concatenate([coeffs_p, -ovlp * coeffs_v])
    s = (
        2.0
        * jnp.sqrt(alphas[:, None] * alphas[None, :])
        / (alphas[:, None] + alphas[None, :])
    ) ** (l + 1.5)
    norm = jnp.sqrt(coeffs @ s @ coeffs)
    return alphas, coeffs / norm


def _prim_norm_jnp(alpha, lxyz):
    l = sum(lxyz)
    df = (
        _double_factorial(2 * lxyz[0] - 1)
        * _double_factorial(2 * lxyz[1] - 1)
        * _double_factorial(2 * lxyz[2] - 1)
    )
    return (2.0 * alpha / math.pi) ** 0.75 * (4.0 * alpha) ** (l / 2.0) / math.sqrt(df)


class FragmentSpec:
    """Static structure of one fragment + a theta->FragmentData rebuilder."""

    def __init__(self, numbers, coords, charge, mult, variant="gfn1",
                 pad_to=None):
        self.numbers = np.asarray(numbers, dtype=np.int64)
        self.base = fragment_data_from_batch(
            build_batch([(self.numbers, coords, charge, mult)],
                        variant=variant, pad_to=pad_to)
        )
        self.base = jax.tree.map(lambda x: x[0], self.base)
        self.variant = variant
        params = params_gfn1 if variant == "gfn1" else __import__(
            "metalquicha_tpu.methods.xtb.params_gfn2", fromlist=["x"]
        )
        # static shell metadata per atom (for rebuild)
        self.shell_meta = []  # list over real shells: (z, shell_idx, n, l, ngauss)
        for z in self.numbers:
            rec = params.get_element(int(z))
            for si, shell in enumerate(rec.shells):
                n, l = params.shell_n_l(shell)
                self.shell_meta.append((int(z), si, n, l, rec.ngauss[si]))
        # static AO metadata: (real_shell_index, lxyz)
        self.ao_meta = []
        for shell_index, (z, si, n, l, ng) in enumerate(self.shell_meta):
            for lxyz in CARTESIAN_COMPONENTS[l]:
                self.ao_meta.append((shell_index, lxyz))

    def rebuild(self, theta) -> FragmentData:
        base = self.base
        nsh = base.sh_mask.shape[0]
        nao = base.ao_mask.shape[0]
        nprim = base.prim_alpha.shape[1]
        nat = base.atom_mask.shape[0]

        sh_level = [None] * len(self.shell_meta)
        sh_kcn = [None] * len(self.shell_meta)
        sh_poly = [None] * len(self.shell_meta)
        sh_eta = [None] * len(self.shell_meta)
        # per-element shell CGTOs (rebuild once per element)
        cgto_cache = {}
        for key in {(z,) for (z, *_rest) in self.shell_meta}:
            z = key[0]
            el = theta["elements"][z]
            params = params_gfn1 if self.variant == "gfn1" else __import__(
                "metalquicha_tpu.methods.xtb.params_gfn2", fromlist=["x"]
            )
            rec = params.get_element(z)
            shells = []
            for si, shell in enumerate(rec.shells):
                n, l = params.shell_n_l(shell)
                a, c = _cgto_from_zeta(rec.ngauss[si], n, l, el["slater"][si])
                shells.append([a, c, l])
            # orthogonalize same-l pairs (H 2s vs 1s)
            for i in range(len(shells)):
                for j in range(i + 1, len(shells)):
                    if shells[i][2] == shells[j][2]:
                        aj, cj = _ortho(
                            shells[i][0], shells[i][1],
                            shells[j][0], shells[j][1], shells[i][2],
                        )
                        shells[j][0], shells[j][1] = aj, cj
            cgto_cache[z] = shells

        for k, (z, si, n, l, ng) in enumerate(self.shell_meta):
            el = theta["elements"][z]
            sh_level[k] = el["levels"][si] * EV2AU
            sh_kcn[k] = el["kcn"][si] * EV2AU
            sh_poly[k] = el["shpoly"][si]
            sh_eta[k] = el["gam"] * el["lgam"][si]

        def padvec(vals, n, fill):
            arr = jnp.stack(vals) if vals else jnp.zeros(0)
            return jnp.concatenate(
                [arr, jnp.full(n - len(vals), fill, dtype=base.coords.dtype)]
            )

        sh_level = padvec(sh_level, nsh, 100.0)
        sh_kcn = padvec(sh_kcn, nsh, 0.0)
        sh_poly = padvec(sh_poly, nsh, 0.0)
        sh_eta = padvec(sh_eta, nsh, 1.0)

        # AO primitive tables
        rows_a, rows_c = [], []
        for shell_index, lxyz in self.ao_meta:
            z, si, n, l, ng = self.shell_meta[shell_index]
            a, c = cgto_cache[z][si][0], cgto_cache[z][si][1]
            norms = jnp.stack([_prim_norm_jnp(ai, lxyz) for ai in a])
            a_row = jnp.concatenate(
                [a, jnp.zeros(nprim - a.shape[0], dtype=a.dtype)]
            )
            c_row = jnp.concatenate(
                [c * norms, jnp.zeros(nprim - a.shape[0], dtype=a.dtype)]
            )
            rows_a.append(a_row)
            rows_c.append(c_row)
        prim_alpha = jnp.stack(rows_a + [jnp.zeros(nprim)] * (nao - len(rows_a)))
        prim_coeff = jnp.stack(rows_c + [jnp.zeros(nprim)] * (nao - len(rows_c)))

        # atom-level
        at_gam3, at_alpha, at_zeff = [], [], []
        for z in self.numbers:
            el = theta["elements"][int(z)]
            at_gam3.append(el["gam3"])
            at_alpha.append(el["alpha"])
            at_zeff.append(el["zeff"])
        at_gam3 = padvec(at_gam3, nat, 0.0)
        at_alpha = padvec(at_alpha, nat, 1.0)
        at_zeff = padvec(at_zeff, nat, 0.0)

        return base._replace(
            sh_level=sh_level,
            sh_kcn=sh_kcn,
            sh_poly=sh_poly,
            sh_eta=sh_eta,
            prim_alpha=prim_alpha,
            prim_coeff=prim_coeff,
            at_gam3=at_gam3,
            at_alpha=at_alpha,
            at_zeff=at_zeff,
        )


def make_settings(theta_globals, base: EngineSettings) -> EngineSettings:
    """EngineSettings with theta-dependent K factors (still static floats
    inside one evaluation; jax.jacrev differentiates through jnp.asarray of
    the kll tuple because h0_matrix consumes jnp arrays)."""
    return base


def energy_fn(spec: FragmentSpec, settings: EngineSettings):
    """Returns E(theta) for one fragment spec (differentiable)."""
    from .calculator import single_point_energy

    def fn(theta):
        frag = spec.rebuild(theta)
        # globals enter via settings.kll — rebuild as jnp inside h0 by
        # patching the arrays the engine consumes
        e, _aux = single_point_energy(frag.coords, frag, settings)
        return e

    return fn
