#!/usr/bin/env python3
"""Decompose the gly3 GMBE-vs-unfragmented pair by energy component.

D = sum_t c_t E(term_t) - E(full) is off by +2.916e-5 Ha vs the reference
(parameter-invariant under fits). The PIE covers every local interaction
exactly once; D is dominated by interactions between atoms never sharing a
term: {0,6,7} x {16..23} (24 pairs, 13-21 Bohr). Splitting D into
e_el / e_rep / e_disp localizes which physical channel carries the error.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from metalquicha_tpu.compile_cache import enable as _enable_cache

_enable_cache()

from fit_gfn1 import fragments_and_weights  # noqa: E402
from metalquicha_tpu.methods.xtb.calculator import single_point_energy  # noqa: E402
from metalquicha_tpu.methods.xtb.engine import settings_from_params  # noqa: E402
from metalquicha_tpu.methods.xtb.param_fit import FragmentSpec  # noqa: E402


def _bucket(n):
    for b in (4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128):
        if n <= b:
            return b
    return n


def components(frag, settings):
    nat = frag.n_total
    pad = (_bucket(nat), 2 * _bucket(nat), int(2.5 * _bucket(nat)) + 1)
    spec = FragmentSpec(frag.numbers, frag.coords, frag.charge,
                        frag.multiplicity, pad_to=pad)
    base = spec.base
    coords = np.asarray(base.coords).copy()
    coords[:nat] = frag.coords
    e, aux = single_point_energy(np.asarray(coords), base, settings)
    return (float(e), float(aux["e_el"]), float(aux["e_rep"]),
            float(aux["e_disp"]), float(aux["scf_residual"]))


def main():
    settings = settings_from_params("gfn1", max_scf_iter=64)
    full_frags, full_w = fragments_and_weights("gly3_unfrag")
    pie_frags, pie_w = fragments_and_weights("gmbe_gly3")

    rows = []
    for label, frag, w in (
        [("full", full_frags[0], 1.0)]
        + [(f"t{i}(c={int(c)},n={f.n_total})", f, c)
           for i, (f, c) in enumerate(zip(pie_frags, pie_w))]
    ):
        tot, e_el, e_rep, e_disp, resid = components(frag, settings)
        rows.append((label, w, tot, e_el, e_rep, e_disp, resid))
        print(f"{label:>16s} w={w:+.0f} E={tot:+.9f} el={e_el:+.9f} "
              f"rep={e_rep:+.9f} disp={e_disp:+.9f} resid={resid:.1e}",
              flush=True)

    full = rows[0]
    terms = rows[1:]
    print("\nsigned PIE sum minus full (component D):")
    for k, namek in ((2, "total"), (3, "e_el"), (4, "e_rep"), (5, "e_disp")):
        D = sum(w * r[k] for r in terms for w in [r[1]]) - full[k]
        print(f"  D_{namek:6s} = {D:+.6e} Ha")
    print("\nreference D_total = -1.2884014e-03 (GMBE - unfrag)")
    print("our shipped residual: D_total(ours) - D_total(ref) = +2.916e-05")


if __name__ == "__main__":
    main()
