"""Parameter overlay roundtrip tests (fit output -> production tables)."""

import json

import numpy as np
import pytest


def test_theta_tables_roundtrip(tmp_path):
    """theta -> JSON -> load_overlay must reproduce the engine energy."""
    import jax

    from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
    from metalquicha_tpu.methods.xtb import params_gfn1
    from metalquicha_tpu.methods.xtb.calculator import (
        XtbCalculator,
        single_point_energy,
    )
    from metalquicha_tpu.methods.xtb.engine import settings_from_params
    from metalquicha_tpu.methods.xtb.param_fit import (
        FragmentSpec,
        theta_init,
    )

    w = (
        np.array(
            [[0.0, 0.0, 0.117], [0.0, 0.757, -0.471], [0.0, -0.757, -0.471]]
        )
        * ANGSTROM_TO_BOHR
    )
    numbers = np.array([8, 1, 1])
    settings = settings_from_params("gfn1")

    # perturb a few parameters (incl. the extended fields)
    theta = theta_init("gfn1")
    theta["elements"][8]["levels"] = theta["elements"][8]["levels"] + 0.05
    theta["elements"][1]["rad"] = theta["elements"][1]["rad"] * 1.02
    theta["d3_pairs"] = theta["d3_pairs"] * 1.01

    spec = FragmentSpec(numbers, w, 0, 1)
    frag = spec.rebuild(theta)
    e_theta, _ = single_point_energy(frag.coords, frag, settings)

    # save as overlay JSON and apply to the production tables
    from metalquicha_tpu.methods.xtb.dispersion_d3 import REF_CN
    from metalquicha_tpu.methods.xtb.param_fit import FITTED_Z

    pairs = 0.5 * (
        np.asarray(theta["d3_pairs"])
        + np.asarray(theta["d3_pairs"]).transpose(1, 0, 3, 2)
    )
    pair_overlay = {}
    for i, zi in enumerate(FITTED_Z):
        for j, zj in enumerate(FITTED_Z):
            if zi > zj:
                continue
            ni, nj = len(REF_CN[zi]), len(REF_CN[zj])
            pair_overlay[f"{zi}-{zj}"] = pairs[i, j, :ni, :nj].tolist()
    overlay = {
        "elements": {
            str(z): {k: np.asarray(v).tolist() for k, v in el.items()}
            for z, el in theta["elements"].items()
        },
        "d3_c6_pairs": pair_overlay,
    }
    path = tmp_path / "ov.json"
    path.write_text(json.dumps(overlay))

    snapshot = {
        "rad": params_gfn1.ATOMIC_RADII_A.copy(),
        "rcov": params_gfn1.COVALENT_RADII_A.copy(),
    }
    import copy

    from metalquicha_tpu.methods.xtb import dispersion_d3

    rec_snap = copy.deepcopy(params_gfn1.ELEMENTS)
    c6_snap = copy.deepcopy(dispersion_d3.REF_C6_DIAG)
    r4r2_snap = copy.deepcopy(dispersion_d3.R4R2)
    try:
        params_gfn1.load_overlay(str(path))
        calc = XtbCalculator(settings)
        fd = calc.make_batch([(numbers, w, 0, 1)])
        e_prod, _ = calc.energies(fd)
        assert float(e_prod[0]) == pytest.approx(float(e_theta), abs=1e-11)
    finally:
        # restore global tables so other tests see the base parameterization
        params_gfn1.ATOMIC_RADII_A[:] = snapshot["rad"]
        params_gfn1.COVALENT_RADII_A[:] = snapshot["rcov"]
        params_gfn1.ELEMENTS.clear()
        params_gfn1.ELEMENTS.update(rec_snap)
        dispersion_d3.REF_C6_DIAG.clear()
        dispersion_d3.REF_C6_DIAG.update(c6_snap)
        dispersion_d3.R4R2.clear()
        dispersion_d3.R4R2.update(r4r2_snap)
        dispersion_d3._PAIR_OVERRIDES.clear()
        dispersion_d3.invalidate_caches()
        from metalquicha_tpu.methods.xtb.batch import element_basis

        element_basis.cache_clear()


def test_solvation_overlay_survives_import_order():
    """The fitted solvation constants must be live regardless of which
    solvation submodule triggered the package import (regression: a circular
    born<->cpcm import let cpcm's own constants clobber the overlay)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(
        repo, "metalquicha_tpu", "methods", "xtb", "data", "solv_fitted.json"
    )
    if not os.path.exists(data):
        import pytest

        pytest.skip("no fitted solvation overlay installed")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from metalquicha_tpu.methods.xtb.solvation.cpcm import CpcmSolvation\n"
        "from metalquicha_tpu.methods.xtb.solvation import cpcm\n"
        "import json\n"
        f"d = json.load(open({data!r}))\n"
        "assert abs(cpcm.COSMO_X - d['cosmo_x']) < 1e-12, cpcm.COSMO_X\n"
        "assert abs(cpcm.SELF_INTERACTION - d['cpcm_zeta']) < 1e-12\n"
        "print('overlay live')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=repo, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    assert "overlay live" in out.stdout


def test_theta_from_overlay_preserves_globals(tmp_path):
    """Warm-starting a fit from another fit's JSON must keep its globals.

    Regression: theta_from_overlay read elements + d3_pairs but not the
    globals block, silently resetting fitted kss/ksp/.../disp_* to the
    installed-module values (measured as a 3.95e-4 -> 2.7e-3 wrmse seed
    regression in the round-3 refit)."""
    import jax.numpy as jnp

    from metalquicha_tpu.methods.xtb.batch import GLB_FIELDS
    from metalquicha_tpu.methods.xtb.param_fit import (
        theta_from_overlay,
        theta_init,
    )

    theta = theta_init("gfn1")
    assert "globals" in theta, "globals are traced fit parameters"
    gvec = np.asarray(theta["globals"], dtype=float).copy()
    gvec += 0.017  # move EVERY global off the module value

    out = {
        "elements": {
            str(z): {k: np.asarray(v).tolist() for k, v in el.items()}
            for z, el in theta["elements"].items()
        },
        "globals": {n: float(gvec[k]) for k, n in enumerate(GLB_FIELDS)},
        "d3_pairs": np.asarray(theta["d3_pairs"]).tolist(),
    }
    path = tmp_path / "fit_out.json"
    path.write_text(json.dumps(out))

    back = theta_from_overlay(str(path), "gfn1")
    np.testing.assert_allclose(
        np.asarray(back["globals"]), gvec, rtol=0, atol=1e-14
    )
