#!/usr/bin/env python3
"""Scan the ATM-form 3-body lever (s9, rs9) for the w20 closure.

For each damping-range scale rs9 (critical radii scaled by rs9, alp=16):
  - beyond-pairwise ATM on w20 = ATM(full) - MBE2(ATM): the part the
    MBE(4) weights keep and no pair-level knob can absorb;
  - required s9 = +2.041e-3 / beyond-pairwise (the w20 residual);
  - the footprint s9*ATM(total) that choice leaves on each anchor
    geometry (gly3, h3o+, prism hexamer, decane), plus the prism
    beyond-pairwise footprint (what an MBE2 target actually sees).

Goal: find rs9 where the required s9 stays O(1) and the non-absorbable
anchor footprints stay small relative to their 1e-6 tolerances.
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

RESIDUAL = 2.041e-3  # reference - ours on w20 (what the term must supply)


def load_xyz(name):
    path = os.path.join(REPO, "validation", "inputs", "sample_inputs", name)
    syms, coords = [], []
    with open(path) as fh:
        lines = fh.read().split("\n")
    for ln in lines[2:]:
        p = ln.split()
        if len(p) >= 4:
            syms.append(p[0])
            coords.append([float(x) for x in p[1:4]])
    numbers = np.array([symbol_to_number(s) for s in syms])
    return np.asarray(coords) * ANGSTROM_TO_BOHR, numbers


def atm_energy(coords, numbers, rs9, alp=16.0):
    """Vectorized ATM with rs9-scaled BJ critical radii (s9 = 1)."""
    numbers = np.asarray(numbers)
    nat = len(numbers)
    tab = build_d3_tables(numbers)
    pair_table = np.asarray(full_pair_table(True))
    g = P.GLOBALS
    rcov = np.array([P.COVALENT_RADII_A[int(z)] for z in numbers]) * ANGSTROM_TO_BOHR
    cn = coordination_numbers(
        jnp.asarray(coords), jnp.asarray(rcov), jnp.ones(nat), g.kcn_exp,
        getattr(g, "cn_type_d3", "exp"),
    )
    c6 = np.asarray(
        c6_coefficients(
            cn, jnp.asarray(tab["ref_cn"]), jnp.asarray(tab["zidx"]),
            jnp.asarray(pair_table), jnp.asarray(tab["sqrtc6"]),
        )
    )
    r4r2 = tab["r4r2"]
    r0 = rs9 * (
        g.disp_a1 * np.sqrt(3.0 * r4r2[:, None] * r4r2[None, :]) + g.disp_a2
    )
    d = coords[:, None, :] - coords[None, :, :]
    r2 = (d**2).sum(-1)
    r = np.sqrt(np.maximum(r2, 1e-300))

    # vectorized over triples via (N,N,N) tensors
    r2ij = r2[:, :, None]
    r2jk = r2[None, :, :]
    r2ik = r2[:, None, :]
    rrr = r[:, :, None] * r[None, :, :] * r[:, None, :]
    c9 = np.sqrt(
        np.maximum(c6[:, :, None] * c6[None, :, :] * c6[:, None, :], 0.0)
    )
    ang = (
        0.375
        * (r2ij + r2jk - r2ik)
        * (r2ij - r2jk + r2ik)
        * (-r2ij + r2jk + r2ik)
        / np.maximum(r2ij * r2jk * r2ik, 1e-300)
        + 1.0
    )
    r0p = r0[:, :, None] * r0[None, :, :] * r0[:, None, :]
    fd = 1.0 / (1.0 + 6.0 * (r0p / np.maximum(rrr, 1e-300)) ** (alp / 3.0))
    i, j, k = np.meshgrid(np.arange(nat), np.arange(nat), np.arange(nat),
                          indexing="ij")
    tri = (i < j) & (j < k)
    e = np.where(tri, c9 * ang * fd / np.maximum(rrr, 1e-300) ** 3, 0.0)
    return float(e.sum())


def main() -> int:
    inp = os.path.join(REPO, "validation", "inputs", "w20_isomer.json")
    with open(inp) as fh:
        data = json.load(fh)
    cw, nw = load_xyz("w20_isomer1.xyz")
    frags = data["molecules"][0]["fragments"]

    geoms = {
        "gly3": load_xyz("gly3.xyz"),
        "h3o": load_xyz("h3op.xyz"),
        "prism": load_xyz("prism.xyz"),
        "decane": load_xyz("decane.xyz"),
    }
    # prism monomers: 6 waters, consecutive OHH triples
    pc, pn = geoms["prism"]
    prism_frags = [list(range(3 * a, 3 * a + 3)) for a in range(6)]

    def beyond_pair(coords, numbers, frag_list, rs9):
        def e_of(monos):
            idx = np.concatenate([np.asarray(frag_list[m]) for m in monos])
            return atm_energy(coords[idx], numbers[idx], rs9)
        full = atm_energy(coords, numbers, rs9)
        mono = np.array([e_of([a]) for a in range(len(frag_list))])
        mbe2 = mono.sum()
        for a, b in itertools.combinations(range(len(frag_list)), 2):
            mbe2 += e_of([a, b]) - mono[a] - mono[b]
        return full - mbe2, full

    print(f"{'rs9':>5} {'w20_beyond':>12} {'s9_req':>8} "
          f"{'gly3*s9':>10} {'h3o*s9':>10} {'prism_bp*s9':>12} "
          f"{'decane*s9':>10}")
    for rs9 in (1.0, 0.9, 0.8, 0.75, 0.7, 0.65, 0.6, 0.55, 0.5):
        bp_w20, _ = beyond_pair(cw, nw, frags, rs9)
        s9 = RESIDUAL / bp_w20 if bp_w20 != 0 else float("inf")
        bp_prism, _full_prism = beyond_pair(pc, pn, prism_frags, rs9)
        row = [atm_energy(*geoms["gly3"], rs9) * s9,
               atm_energy(*geoms["h3o"], rs9) * s9,
               bp_prism * s9,
               atm_energy(*geoms["decane"], rs9) * s9]
        print(f"{rs9:5.2f} {bp_w20:+12.3e} {s9:8.2f} "
              f"{row[0]:+10.2e} {row[1]:+10.2e} {row[2]:+12.2e} "
              f"{row[3]:+10.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
