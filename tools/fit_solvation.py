#!/usr/bin/env python3
"""Calibrate implicit solvation against the three reference solvation
energies (hydronium in water: ALPB, GBSA, CPCM).

The gas-phase GFN1 parameterization must be fitted first (fit_gfn1.py);
solvation parameters then absorb the solvation free energy:
    ALPB  -5.91221983940207
    GBSA  -5.935225830899037
    CPCM  -5.881430808516041
ALPB and GBSA share the generalized-Born machinery (vdW radii, descreening,
intrinsic-radius offset) and differ by the ALPB correction; CPCM fits its
dielectric scaling and self-interaction.

Usage: python tools/fit_solvation.py --iters 60 --out tools/fitted_solv.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from metalquicha_tpu.compile_cache import enable as _enable_cache

_enable_cache()


import numpy as np

from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
from metalquicha_tpu.io.xyz import read_xyz_file
from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
from metalquicha_tpu.methods.xtb.engine import settings_from_params
from metalquicha_tpu.methods.xtb.solvation import born as born_mod
from metalquicha_tpu.methods.xtb.solvation import cpcm as cpcm_mod
from metalquicha_tpu.methods.xtb.solvation.born import BornSolvation
from metalquicha_tpu.methods.xtb.solvation.cpcm import CpcmSolvation

EXPECTED = {
    "alpb": -5.91221983940207,
    "gbsa": -5.935225830899037,
    "cpcm": -5.881430808516041,
}


def build_eval():
    """Three jitted energy functions (alpb/gbsa/cpcm) taking the dynamic
    per-atom radii/descreening and scalar parameters — ONE compile each."""
    import jax.numpy as jnp

    from metalquicha_tpu.methods.xtb.calculator import (
        fragment_data_from_batch,
        single_point_energy,
    )
    from metalquicha_tpu.methods.xtb.batch import build_batch

    geom = read_xyz_file(
        os.path.join(REPO, "validation", "inputs", "sample_inputs", "h3op.xyz")
    )
    numbers = geom.numbers
    frag_tuple = (numbers, geom.coords_angstrom * ANGSTROM_TO_BOHR, 1, 1)
    settings = settings_from_params("gfn1")
    base = fragment_data_from_batch(build_batch([frag_tuple]))
    base = jax.tree.map(lambda x: x[0], base)
    is_h = np.asarray(numbers) == 1

    from metalquicha_tpu.methods.xtb.solvation import dielectric_for

    eps_w = dielectric_for("water")
    models = {
        "alpb": BornSolvation(dielectric=eps_w, alpb=True),
        "gbsa": BornSolvation(dielectric=eps_w, alpb=False),
        "cpcm": CpcmSolvation(dielectric=eps_w, nang=1000),  # w1_water_cpcm input
    }

    jitted = {}
    tensions = {}
    for name, model in models.items():
        tabs = model.host_tables(numbers)
        tensions[name] = jnp.asarray(
            tabs.get("solv_tension", np.zeros(len(numbers)))
        )

        def e_of(rvdw, sx, scalars, model=model, name=name):
            frag = base._replace(
                solv_rvdw=rvdw, solv_sx=sx, solv_scalars=scalars,
                solv_tension=tensions[name],
            )
            e, _ = single_point_energy(
                frag.coords, frag, settings, solvation=model
            )
            return e

        jitted[name] = jax.jit(e_of)

    def energies(x):
        rv_a = jnp.asarray(np.where(is_h, x[0], x[1]) * ANGSTROM_TO_BOHR)
        sx_a = jnp.asarray(np.where(is_h, x[2], x[3]))
        sc_a = jnp.asarray(
            [x[4] * ANGSTROM_TO_BOHR, x[5],
             born_mod.GSHIFT_DEFAULT, born_mod.PROBE_RADIUS])
        rv_g = jnp.asarray(np.where(is_h, x[6], x[7]) * ANGSTROM_TO_BOHR)
        sx_g = jnp.asarray(np.where(is_h, x[8], x[9]))
        sc_g = jnp.asarray(
            [x[10] * ANGSTROM_TO_BOHR, 0.0,
             born_mod.GSHIFT_DEFAULT, born_mod.PROBE_RADIUS])
        sc_c = jnp.asarray([x[11], x[12], 0.0, 0.0])
        rv_c = jnp.asarray(np.where(is_h, x[13], x[14]) * ANGSTROM_TO_BOHR)
        return {
            "alpb": float(jitted["alpb"](rv_a, sx_a, sc_a)),
            "gbsa": float(jitted["gbsa"](rv_g, sx_g, sc_g)),
            "cpcm": float(jitted["cpcm"](rv_c, jnp.zeros_like(sx_a), sc_c)),
        }

    return energies


# parameter vector: [vdw_H, vdw_O, descreen_H, descreen_O, rho_offset_A,
#                    alpb_alpha, cosmo_x, cpcm_zeta]
# [0:5] ALPB vdw_H/vdw_O/descreen_H/descreen_O/rho_offset_A; [5] ALPB alpha;
# [6:11] GBSA same five; [11:13] CPCM cosmo_x, zeta
X0 = np.array([1.20, 1.52, 0.85, 0.85, 0.09, 0.571412,
               1.20, 1.52, 0.85, 0.85, 0.09,
               0.5, 1.07, 1.20, 1.52])
LB = np.array([0.6, 0.9, 0.3, 0.3, 0.0, 0.0,
               0.6, 0.9, 0.3, 0.3, 0.0,
               0.0, 0.5, 0.6, 0.9])
UB = np.array([2.5, 2.8, 1.2, 1.2, 0.6, 2.0,
               2.5, 2.8, 1.2, 1.2, 0.6,
               2.0, 2.5, 2.5, 2.8])


def apply_params(x):
    """Persist fitted values into the solvation modules (for production)."""
    ps_a = born_mod.PARAM_SETS["alpb"]
    ps_g = born_mod.PARAM_SETS["gbsa"]
    ps_a["vdw"][1], ps_a["vdw"][8] = x[0], x[1]
    ps_a["descreen"][1], ps_a["descreen"][8] = x[2], x[3]
    ps_a["rho_offset_a"], ps_a["alpha"] = x[4], x[5]
    ps_g["vdw"][1], ps_g["vdw"][8] = x[6], x[7]
    ps_g["descreen"][1], ps_g["descreen"][8] = x[8], x[9]
    ps_g["rho_offset_a"] = x[10]
    cpcm_mod.COSMO_X = x[11]
    cpcm_mod.SELF_INTERACTION = x[12]


def residuals_fn(energies, nang=230):
    def f(x):
        e = energies(x)
        return np.array([e[k] - EXPECTED[k] for k in ("alpb", "gbsa", "cpcm")])

    return f


NAMES = ["alpb_vdw_H", "alpb_vdw_O", "alpb_descreen_H", "alpb_descreen_O",
         "alpb_rho_offset_A", "alpb_alpha",
         "gbsa_vdw_H", "gbsa_vdw_O", "gbsa_descreen_H", "gbsa_descreen_O",
         "gbsa_rho_offset_A", "cosmo_x", "cpcm_zeta",
         "cpcm_vdw_H", "cpcm_vdw_O"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--nang", type=int, default=230)
    ap.add_argument("--out", default=os.path.join(HERE, "fitted_solv.json"))
    ap.add_argument("--diff-step", type=float, default=0.02,
                    help="relative FD step for the Jacobian")
    ap.add_argument("--tol", type=float, default=1e-8,
                    help="ftol/xtol/gtol for least_squares (tighten to "
                         "polish past the default 1e-8 stopping point)")
    args = ap.parse_args()

    energies = build_eval()
    f = residuals_fn(energies, args.nang)
    # warm start from the installed overlay when present
    try:
        import json as _json

        with open(args.out) as fh:
            prev = _json.load(fh)
        x0_map = dict(zip(NAMES, X0))
        for k, v in prev.items():
            if k in x0_map:
                x0_map[k] = float(v)
        X0[:] = [x0_map[k] for k in NAMES]
        print("warm-started from", args.out)
    except (FileNotFoundError, _json.JSONDecodeError):
        pass
    t0 = time.time()
    r0 = f(X0)
    print("start residuals:", r0, f"[{time.time()-t0:.0f}s]")

    from scipy.optimize import least_squares

    res = least_squares(
        f, X0, bounds=(LB, UB), diff_step=args.diff_step,
        max_nfev=args.iters * 9, verbose=2, x_scale="jac",
        ftol=args.tol, xtol=args.tol, gtol=args.tol,
    )
    print("final residuals:", f(res.x))
    names = NAMES
    out = dict(zip(names, res.x.tolist()))
    out["residuals"] = dict(zip(EXPECTED, f(res.x).tolist()))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
