#!/usr/bin/env python3
"""Test the ATM hypothesis for the w20 MBE(4) residual.

Hypothesis: the -2.04e-3 Ha parameter-stationary w20 residual is the
Axilrod-Teller-Muto three-body dispersion term that tblite's D3 applies
(s9=1, rational-damping critical radii) and our D3(BJ) omits
(params_gfn1.disp_s9 = 0.0). ATM is a pure 3-body atomic potential:
it telescopes EXACTLY through MBE(>=3) weights, its monomer/dimer part
is absorbable by the pair-pinning anchors, and its beyond-pairwise part
for a compact 20-water cluster is repulsive at O(1e-3) — precisely the
signature STATUS.md derived for the missing component.

Prints: ATM(full), MBE2(ATM), MBE3(ATM), and the beyond-pairwise part
ATM(full) - MBE2(ATM), to compare against +2.041e-3.
"""
import itertools
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
from metalquicha_tpu.elements import symbol_to_number
from metalquicha_tpu.methods.xtb import params_gfn1 as P
from metalquicha_tpu.methods.xtb.dispersion_d3 import (
    build_d3_tables,
    c6_coefficients,
    full_pair_table,
)
from metalquicha_tpu.methods.xtb.engine import coordination_numbers

RESIDUAL = -2.041e-3  # w20 total minus reference, parameter-stationary


def atm_energy(coords, numbers, s9=1.0, alp=16.0):
    """ATM three-body dispersion (D4/tblite-style rational critical radii).

    E3 = s9 * sum_{i<j<k} sqrt(C6ij C6jk C6ik) * ang * fdamp / (rij rjk rik)^3
    ang = 0.375*(r2ij+r2jk-r2ik)(r2ij-r2jk+r2ik)(-r2ij+r2jk+r2ik)
          / (r2ij r2jk r2ik) + 1
    fdamp = 1 / (1 + 6*((r0ij r0jk r0ik)/(rij rjk rik))^(alp/3)),
    r0ij = a1*sqrt(3 r4r2_i r4r2_j) + a2 (the BJ critical radii).
    """
    numbers = np.asarray(numbers)
    nat = len(numbers)
    tab = build_d3_tables(numbers)
    pair_table = np.asarray(full_pair_table(True))
    g = P.GLOBALS
    rcov = np.array([P.COVALENT_RADII_A[int(z)] for z in numbers]) * ANGSTROM_TO_BOHR
    mask = jnp.ones(nat)
    cn = coordination_numbers(
        jnp.asarray(coords), jnp.asarray(rcov), mask, g.kcn_exp,
        getattr(g, "cn_type_d3", "exp"),
    )
    c6 = np.asarray(
        c6_coefficients(
            cn, jnp.asarray(tab["ref_cn"]), jnp.asarray(tab["zidx"]),
            jnp.asarray(pair_table), jnp.asarray(tab["sqrtc6"]),
        )
    )
    r4r2 = tab["r4r2"]
    r0 = g.disp_a1 * np.sqrt(3.0 * r4r2[:, None] * r4r2[None, :]) + g.disp_a2

    d = coords[:, None, :] - coords[None, :, :]
    r2 = (d**2).sum(-1)
    r = np.sqrt(np.maximum(r2, 1e-300))

    e = 0.0
    for i, j, k in itertools.combinations(range(nat), 3):
        r2ij, r2jk, r2ik = r2[i, j], r2[j, k], r2[i, k]
        rrr = r[i, j] * r[j, k] * r[i, k]
        c9 = np.sqrt(max(c6[i, j] * c6[j, k] * c6[i, k], 0.0))
        ang = (
            0.375
            * (r2ij + r2jk - r2ik)
            * (r2ij - r2jk + r2ik)
            * (-r2ij + r2jk + r2ik)
            / (r2ij * r2jk * r2ik)
            + 1.0
        )
        fd = 1.0 / (1.0 + 6.0 * ((r0[i, j] * r0[j, k] * r0[i, k]) / rrr) ** (alp / 3.0))
        e += c9 * ang * fd / rrr**3
    return s9 * e


def main() -> int:
    inp = os.path.join(REPO, "validation", "inputs", "w20_isomer.json")
    with open(inp) as fh:
        data = json.load(fh)
    xyz_path = os.path.join(os.path.dirname(inp), data["molecules"][0]["xyz"])
    syms, coords = [], []
    with open(xyz_path) as fh:
        lines = fh.read().split("\n")
    for ln in lines[2:]:
        p = ln.split()
        if len(p) >= 4:
            syms.append(p[0])
            coords.append([float(x) for x in p[1:4]])
    coords = np.asarray(coords) * ANGSTROM_TO_BOHR
    numbers = np.array([symbol_to_number(s) for s in syms])
    frags = data["molecules"][0]["fragments"]
    nf = len(frags)
    print(f"{len(numbers)} atoms, {nf} monomers")

    def e_of(monos):
        idx = np.concatenate([np.asarray(frags[m]) for m in monos])
        return atm_energy(coords[idx], numbers[idx])

    e_full = atm_energy(coords, numbers)
    e_mono = np.array([e_of([a]) for a in range(nf)])
    print(f"ATM(full)        {e_full:+.6e}")
    print(f"sum ATM(mono)    {e_mono.sum():+.6e}")

    mbe2 = e_mono.sum()
    pair_delta = {}
    for a, b in itertools.combinations(range(nf), 2):
        dab = e_of([a, b]) - e_mono[a] - e_mono[b]
        pair_delta[(a, b)] = dab
        mbe2 += dab
    print(f"MBE2(ATM)        {mbe2:+.6e}")
    beyond = e_full - mbe2
    print(f"ATM(full)-MBE2   {beyond:+.6e}   vs residual {-RESIDUAL:+.6e}"
          f"   ratio {beyond / -RESIDUAL:.3f}")

    # sanity: a 3-body atomic potential must be exact at MBE(3)
    mbe3 = mbe2
    for a, b, c in itertools.combinations(range(nf), 3):
        d3v = (
            e_of([a, b, c])
            - pair_delta[(a, b)] - pair_delta[(a, c)] - pair_delta[(b, c)]
            - e_mono[a] - e_mono[b] - e_mono[c]
        )
        mbe3 += d3v
    print(f"MBE3(ATM)        {mbe3:+.6e}   (must equal full: "
          f"diff {mbe3 - e_full:+.2e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
