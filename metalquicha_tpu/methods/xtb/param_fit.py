"""Differentiable parameterization: xTB energies as functions of the
parameter vector theta.

The engine's variational energy functional is stationary in the converged
charges, so jax.jacrev through it gives EXACT parameter Jacobians
d(energy)/d(theta) in one backward pass — the machinery used to reconstruct
the GFN1/GFN2 element tables against the reference validation energies
(inverse parameterization), and generally useful for refitting xTB to new
data.

theta layout (per fitted element): levels (eV), slater, kcn (eV), shpoly,
gam, lgam, gam3, alpha, zeff; plus globals (ksp, kpol, ken — not yet
differentiated; they enter via static EngineSettings).

Structure arrays (masks, indices, refocc, radii, D3 tables) stay fixed from
the host-side builder; theta-dependent arrays are rebuilt with VECTORIZED
gathers from small per-(element, shell) tables so the traced graph stays
small even for 70+ atom fragments.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import params_gfn1
from .basis import CARTESIAN_COMPONENTS, STO_NG
from .batch import build_batch
from .calculator import FragmentData, fragment_data_from_batch
from .params_gfn1 import EV2AU

FITTED_Z = (1, 6, 7, 8)
_Z_INDEX = {z: i for i, z in enumerate(FITTED_Z)}
MAX_SHELLS = 2


def _params_module(variant: str):
    if variant == "gfn2":
        from . import params_gfn2

        return params_gfn2
    return params_gfn1


def theta_init(variant: str = "gfn1") -> dict:
    """Current parameter tables as a theta pytree.

    Includes the uncertain tabulated data (electronegativity, H0 polynomial
    radii, CN covalent radii, D3 r4r2 and diagonal reference C6) so the
    inverse parameterization can absorb table-reconstruction error.
    """
    from ...constants import BOHR_TO_ANGSTROM
    from .batch import element_basis
    from .dispersion_d3 import (
        _Z_TO_IDX, PRISTINE_R4R2, R4R2, full_pair_table,
    )

    # GFN2 thetas seed from the pristine dispersion state — the overlaid
    # values are GFN1 fit state (see dispersion_d3.build_d3_tables).
    r4r2_src = R4R2 if variant != "gfn2" else PRISTINE_R4R2
    params = _params_module(variant)
    theta = {"elements": {}}
    for z in FITTED_Z:
        rec = params.get_element(z)
        eb = element_basis(z, variant)
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
            "en": jnp.asarray(rec.en, dtype=jnp.float64),
            "e0": jnp.asarray(getattr(rec, "e0", 0.0), dtype=jnp.float64),
            "aes": jnp.asarray(
                [getattr(rec, "mrad", 3.0), getattr(rec, "dkernel", 1.0),
                 getattr(rec, "qkernel", 0.1), getattr(rec, "d4ga", 3.0),
                 getattr(rec, "d4zref", 4.0)], dtype=jnp.float64),
            "rad": jnp.asarray(eb.rad_bohr, dtype=jnp.float64),
            "rcov": jnp.asarray(eb.rcov_bohr, dtype=jnp.float64),
            "r4r2": jnp.asarray(r4r2_src[z], dtype=jnp.float64),
        }
    # D3 reference PAIR C6 grids over the fitted elements (the dominant
    # parameter-table unknown: geometric-mean seeds refined by the fit).
    # GFN2 thetas seed from the PRISTINE table — the fitted grids are
    # GFN1 state (see dispersion_d3.full_pair_table).
    full = full_pair_table(fitted=(variant != "gfn2"))
    gidx = np.array([_Z_TO_IDX[z] for z in FITTED_Z])
    theta["d3_pairs"] = jnp.asarray(
        full[np.ix_(gidx, gidx)], dtype=jnp.float64
    )
    # element-pair H0 scaling K_AB over the fitted elements (tblite gfn1
    # kpair analog; identity by default — the H0 pair-scale freedom the
    # published form has and a pair-free parameterization lacks)
    nz = len(FITTED_Z)
    kp = np.ones((nz, nz))
    if hasattr(params, "kpair_value"):
        for i, zi in enumerate(FITTED_Z):
            for j, zj in enumerate(FITTED_Z):
                kp[i, j] = params.kpair_value(zi, zj)
    theta["kpair"] = jnp.asarray(kp)
    # global constants (kss..kcn_exp) are traced through FragmentData.glb
    from .batch import global_vector

    theta["globals"] = jnp.asarray(global_vector(variant))
    return theta


def theta_to_tables(theta: dict, variant: str = "gfn1") -> None:
    """Write theta values back into the parameter module (host-side).

    NOTE: en/rad/rcov/r4r2/d3_c6 extensions are applied to the shared
    radii/D3 tables (variant-global)."""
    from ...constants import BOHR_TO_ANGSTROM
    from . import dispersion_d3

    params = _params_module(variant)
    for z in FITTED_Z:
        el = theta["elements"][z]
        if "rad" in el:
            params.ATOMIC_RADII_A[z] = float(el["rad"]) * BOHR_TO_ANGSTROM
        if "rcov" in el:
            params.COVALENT_RADII_A[z] = float(el["rcov"]) * BOHR_TO_ANGSTROM
        if "r4r2" in el and variant != "gfn2":
            # the shared R4R2 / pair-override tables are GFN1 state; a GFN2
            # fit must not clobber them (GFN2 reads the pristine snapshots)
            dispersion_d3.R4R2[z] = float(el["r4r2"])
        if "en" in el:
            object.__setattr__(params.ELEMENTS[z], "en", float(el["en"]))
    if "d3_pairs" in theta and variant != "gfn2":
        pairs = np.asarray(theta["d3_pairs"])
        pairs = 0.5 * (pairs + pairs.transpose(1, 0, 3, 2))
        overlay = {}
        for i, zi in enumerate(FITTED_Z):
            for j, zj in enumerate(FITTED_Z):
                if zi > zj:
                    continue
                ni = len(dispersion_d3.REF_CN[zi])
                nj = len(dispersion_d3.REF_CN[zj])
                overlay[f"{zi}-{zj}"] = pairs[i, j, :ni, :nj].tolist()
        dispersion_d3.set_pair_table_overlay(overlay)
    dispersion_d3.invalidate_caches()
    from .batch import element_basis

    element_basis.cache_clear()
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
        if "e0" in el:
            object.__setattr__(rec, "e0", float(el["e0"]))
        if "aes" in el:
            aes = np.asarray(el["aes"])
            for k, name in enumerate(
                ("mrad", "dkernel", "qkernel", "d4ga", "d4zref")
            ):
                object.__setattr__(rec, name, float(aes[k]))
    if "globals" in theta:
        from .batch import GLB_FIELDS

        gvec = np.asarray(theta["globals"])
        for k, name in enumerate(GLB_FIELDS):
            setattr(params.GLOBALS, name, float(gvec[k]))



def theta_from_overlay(path: str, variant: str = "gfn1") -> dict:
    """Load a fitted theta from a tools/fit JSON output."""
    import json

    with open(path) as fh:
        data = json.load(fh)
    theta = theta_init(variant)
    for z_str, el in data.get("elements", {}).items():
        z = int(z_str)
        if z not in theta["elements"]:
            continue
        for k, v in el.items():
            if k == "d3_c6":  # legacy diagonal-only field: superseded
                continue
            theta["elements"][z][k] = jnp.asarray(v, dtype=jnp.float64)
    if "d3_pairs" in data:
        theta["d3_pairs"] = jnp.asarray(data["d3_pairs"], dtype=jnp.float64)
    if "kpair" in data and "kpair" in theta:
        zidx = {z: i for i, z in enumerate(FITTED_Z)}
        kp = np.asarray(theta["kpair"], dtype=np.float64).copy()
        for key_str, val in data["kpair"].items():
            zi, zj = (int(t) for t in key_str.split("-"))
            if zi in zidx and zj in zidx:
                kp[zidx[zi], zidx[zj]] = float(val)
                kp[zidx[zj], zidx[zi]] = float(val)
        theta["kpair"] = jnp.asarray(kp)
    if "globals" in data and "globals" in theta:
        # WITHOUT this, fitted global constants (kss/ksp/.../disp_*) were
        # silently replaced by the params-module values whenever a fit was
        # seeded from another fit's output — a lossy warm start that cost
        # an order of magnitude in the seed residuals.
        from .batch import GLB_FIELDS

        vec = np.array(theta["globals"], dtype=np.float64)
        for k, name in enumerate(GLB_FIELDS):
            if name in data["globals"]:
                vec[k] = float(data["globals"][name])
        theta["globals"] = jnp.asarray(vec)
    return theta


# ---------------------------------------------------------------------------
# jnp basis rebuild (differentiable in the slater exponents)
# ---------------------------------------------------------------------------


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _self_overlap(alphas, coeffs, l: int):
    s = (
        2.0
        * jnp.sqrt(alphas[:, None] * alphas[None, :])
        / (alphas[:, None] + alphas[None, :])
    ) ** (l + 1.5)
    return coeffs @ s @ coeffs


def _cgto_from_zeta(ngauss: int, n: int, l: int, zeta):
    a_tab, c_tab = STO_NG[(ngauss, n, l)]
    a_tab = jnp.asarray(a_tab, dtype=zeta.dtype)
    c_tab = jnp.asarray(c_tab, dtype=zeta.dtype)
    alphas = a_tab * zeta * zeta
    return alphas, c_tab / jnp.sqrt(_self_overlap(alphas, c_tab, l))


def _ortho(alphas_v, coeffs_v, alphas_p, coeffs_p, l: int):
    s_vp = (
        2.0
        * jnp.sqrt(alphas_v[:, None] * alphas_p[None, :])
        / (alphas_v[:, None] + alphas_p[None, :])
    ) ** (l + 1.5)
    ovlp = coeffs_v @ s_vp @ coeffs_p
    alphas = jnp.concatenate([alphas_p, alphas_v])
    coeffs = jnp.concatenate([coeffs_p, -ovlp * coeffs_v])
    return alphas, coeffs / jnp.sqrt(_self_overlap(alphas, coeffs, l))


def _element_shell_tables(theta, variant: str, nprim: int, needed_z=None):
    """Small per-(element, shell) tables rebuilt from theta.

    Returns dict of jnp arrays indexed by flat (z_idx * MAX_SHELLS + slot):
    level, kcn, shpoly, eta (Hartree), prim_alpha (nprim), prim_coeff
    (nprim, radial part; cartesian norms applied per AO later), plus
    per-element gam3/alpha/zeff tables indexed by z_idx.
    """
    params = _params_module(variant)
    nz = len(FITTED_Z)
    rows = nz * MAX_SHELLS
    level = [jnp.asarray(100.0, jnp.float64)] * rows
    kcn = [jnp.asarray(0.0, jnp.float64)] * rows
    shpoly = [jnp.asarray(0.0, jnp.float64)] * rows
    eta = [jnp.asarray(1.0, jnp.float64)] * rows
    pa = [jnp.zeros(nprim)] * rows
    pc = [jnp.zeros(nprim)] * rows

    for z in FITTED_Z:
        if needed_z is not None and z not in needed_z:
            continue  # element absent from this fragment (and its nprim
            # budget may be too small for e.g. H's orthogonalized 2s)
        el = theta["elements"][z]
        rec = params.get_element(z)
        shells = []
        for si, shell in enumerate(rec.shells):
            n, l = params.shell_n_l(shell)
            a, c = _cgto_from_zeta(rec.ngauss[si], n, l, el["slater"][si])
            shells.append([a, c, l])
        for i in range(len(shells)):
            for j in range(i + 1, len(shells)):
                if shells[i][2] == shells[j][2]:
                    shells[j][0], shells[j][1] = _ortho(
                        shells[i][0], shells[i][1],
                        shells[j][0], shells[j][1], shells[i][2],
                    )
        for si in range(len(rec.shells)):
            row = _Z_INDEX[z] * MAX_SHELLS + si
            level[row] = el["levels"][si] * EV2AU
            kcn[row] = el["kcn"][si] * EV2AU
            shpoly[row] = el["shpoly"][si]
            eta[row] = el["gam"] * el["lgam"][si]
            a, c = shells[si][0], shells[si][1]
            pa[row] = jnp.concatenate([a, jnp.zeros(nprim - a.shape[0])])
            pc[row] = jnp.concatenate([c, jnp.zeros(nprim - c.shape[0])])

    def atvec(key):
        return jnp.stack([theta["elements"][z][key] for z in FITTED_Z])

    return {
        "level": jnp.stack(level),
        "kcn": jnp.stack(kcn),
        "shpoly": jnp.stack(shpoly),
        "eta": jnp.stack(eta),
        "prim_alpha": jnp.stack(pa),
        "prim_coeff": jnp.stack(pc),
        "gam3": atvec("gam3"),
        "alpha": atvec("alpha"),
        "zeff": atvec("zeff"),
        "en": atvec("en"),
        "e0": atvec("e0"),
        "aes": atvec("aes"),
        "rad": atvec("rad"),
        "rcov": atvec("rcov"),
        "r4r2": atvec("r4r2"),
    }


class FragmentSpec:
    """Static structure of one fragment + a theta->FragmentData rebuilder.

    Coordinates are NOT baked in: energies are evaluated as
    fn(theta, coords) so fragments sharing (numbers, charge, mult) vmap
    over a coords batch with one compiled program.
    """

    def __init__(self, numbers, coords, charge, mult, variant="gfn1",
                 pad_to=None):
        self.numbers = np.asarray(numbers, dtype=np.int64)
        self.variant = variant
        self.base = fragment_data_from_batch(
            build_batch([(self.numbers, coords, charge, mult)],
                        variant=variant, pad_to=pad_to),
            variant=variant,
        )
        self.base = jax.tree.map(lambda x: x[0], self.base)
        params = _params_module(variant)

        nsh = self.base.sh_mask.shape[0]
        nao = self.base.ao_mask.shape[0]
        nat = self.base.atom_mask.shape[0]
        self.nprim = int(self.base.prim_alpha.shape[1])

        # static gather indices: shell -> (z_idx * MAX_SHELLS + slot)
        sh_row = np.zeros(nsh, dtype=np.int64)
        ao_row = np.zeros(nao, dtype=np.int64)
        ao_l = np.zeros(nao, dtype=np.int64)
        ao_df = np.ones(nao)
        at_row = np.zeros(nat, dtype=np.int64)
        isx = iao = 0
        for ia, z in enumerate(self.numbers):
            rec = params.get_element(int(z))
            at_row[ia] = _Z_INDEX[int(z)]
            for si, shell in enumerate(rec.shells):
                _n, l = params.shell_n_l(shell)
                sh_row[isx] = _Z_INDEX[int(z)] * MAX_SHELLS + si
                for lxyz in CARTESIAN_COMPONENTS[l]:
                    ao_row[iao] = sh_row[isx]
                    ao_l[iao] = l
                    ao_df[iao] = (
                        _double_factorial(2 * lxyz[0] - 1)
                        * _double_factorial(2 * lxyz[1] - 1)
                        * _double_factorial(2 * lxyz[2] - 1)
                    )
                    iao += 1
                isx += 1
        self.n_real_sh = isx
        self.n_real_ao = iao
        self.n_real_at = len(self.numbers)
        self.sh_row = jnp.asarray(sh_row)
        self.ao_row = jnp.asarray(ao_row)
        self.ao_l = jnp.asarray(ao_l)
        self.ao_df = jnp.asarray(ao_df)
        self.at_row = jnp.asarray(at_row)

    def rebuild(self, theta) -> FragmentData:
        base = self.base
        tabs = _element_shell_tables(
            theta, self.variant, self.nprim,
            needed_z=set(int(z) for z in self.numbers),
        )
        sh_mask = base.sh_mask
        at_mask = base.atom_mask

        sh_level = jnp.where(sh_mask > 0.5, tabs["level"][self.sh_row], 100.0)
        sh_kcn = jnp.where(sh_mask > 0.5, tabs["kcn"][self.sh_row], 0.0)
        sh_poly = jnp.where(sh_mask > 0.5, tabs["shpoly"][self.sh_row], 0.0)
        sh_eta = jnp.where(sh_mask > 0.5, tabs["eta"][self.sh_row], 1.0)

        # (nao, nprim) primitive tables with per-AO cartesian norms
        a = tabs["prim_alpha"][self.ao_row]
        c = tabs["prim_coeff"][self.ao_row]
        l = self.ao_l[:, None].astype(a.dtype)
        norm = (
            (2.0 * a / math.pi) ** 0.75
            * (4.0 * a) ** (l / 2.0)
            / jnp.sqrt(self.ao_df)[:, None]
        )
        mask_ao = (base.ao_mask > 0.5)[:, None] & (a > 0)
        prim_alpha = jnp.where(mask_ao, a, 0.0)
        prim_coeff = jnp.where(mask_ao, c * norm, 0.0)

        at_gam3 = jnp.where(at_mask > 0.5, tabs["gam3"][self.at_row], 0.0)
        at_alpha = jnp.where(at_mask > 0.5, tabs["alpha"][self.at_row], 1.0)
        at_zeff = jnp.where(at_mask > 0.5, tabs["zeff"][self.at_row], 0.0)
        at_en = jnp.where(at_mask > 0.5, tabs["en"][self.at_row], 0.0)
        at_e0 = jnp.where(at_mask > 0.5, tabs["e0"][self.at_row], 0.0)
        at_aes = jnp.where(
            at_mask[:, None] > 0.5, tabs["aes"][self.at_row],
            jnp.asarray([3.0, 1.0, 0.1, 3.0, 4.0]),
        )
        at_rad = jnp.where(at_mask > 0.5, tabs["rad"][self.at_row], 1.0)
        at_rcov = jnp.where(at_mask > 0.5, tabs["rcov"][self.at_row], 0.0)
        d3_r4r2 = jnp.where(at_mask > 0.5, tabs["r4r2"][self.at_row], 0.0)

        if "kpair" in theta:
            kth = 0.5 * (theta["kpair"] + theta["kpair"].T)
            kp_at = kth[self.at_row[:, None], self.at_row[None, :]]
            pair_real = (at_mask[:, None] > 0.5) & (at_mask[None, :] > 0.5)
            at_kpair = jnp.where(pair_real, kp_at, 1.0)
        else:
            at_kpair = self.base.at_kpair

        # D3 pair C6 table: global geometric-mean table with the fitted
        # element block substituted (symmetrized in the fit parameters)
        from .dispersion_d3 import _Z_TO_IDX, full_pair_table

        pairs = theta["d3_pairs"]
        pairs = 0.5 * (pairs + jnp.transpose(pairs, (1, 0, 3, 2)))
        table = jnp.asarray(
            full_pair_table(fitted=(self.variant != "gfn2")),
            dtype=pairs.dtype,
        )
        gidx = jnp.asarray([_Z_TO_IDX[z] for z in FITTED_Z])
        table = table.at[gidx[:, None], gidx[None, :]].set(pairs)

        glb = (
            theta["globals"]
            if "globals" in theta
            else base.glb
        )

        return base._replace(
            glb=glb,
            d3_c6_pair=table,
            sh_level=sh_level,
            sh_kcn=sh_kcn,
            sh_poly=sh_poly,
            sh_eta=sh_eta,
            prim_alpha=prim_alpha,
            prim_coeff=prim_coeff,
            at_gam3=at_gam3,
            at_alpha=at_alpha,
            at_zeff=at_zeff,
            at_en=at_en,
            at_e0=at_e0,
            at_aes=at_aes,
            at_rad=at_rad,
            at_rcov=at_rcov,
            at_kpair=at_kpair,
            d3_r4r2=d3_r4r2,
        )
