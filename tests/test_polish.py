"""Mixed-precision host polish: f32 device results + f64 host polish must
match the all-f64 parity path (VERDICT r4 item 4: a TPU user's output
energies must match CPU-f64 to 1e-8).

Runs on CPU: force_dtype="f32" makes the device calculator f32 while the
HostPolisher re-evaluates in f64 — the exact production TPU configuration,
minus the accelerator.
"""

import numpy as np
import pytest

from metalquicha_tpu.driver import run_calculation
from metalquicha_tpu.io.config import parse_mqc_string

from test_driver import TWO_WATERS_MQC


def _run(driver, **overrides):
    cfg = parse_mqc_string(TWO_WATERS_MQC.format(driver=driver))
    return run_calculation(
        cfg, write_json=False, driver_overrides=overrides
    )[""]


@pytest.mark.parametrize("what", ["Energy", "Gradient"])
def test_polished_f32_matches_f64(what):
    ref = _run(what, force_dtype="f64")
    raw = _run(what, force_dtype="f32", host_polish="off")
    pol = _run(what, force_dtype="f32")

    e_ref = ref.result.total_energy
    # raw f32 sits at ~1e-4; the polish must close it to <=1e-8
    assert abs(pol.result.total_energy - e_ref) < 1e-8
    assert abs(raw.result.total_energy - e_ref) > abs(
        pol.result.total_energy - e_ref
    )
    if what == "Gradient":
        g_ref = np.asarray(ref.result.gradient)
        g_pol = np.asarray(pol.result.gradient)
        assert np.abs(g_pol - g_ref).max() < 1e-8


def test_polished_hessian_matches_f64():
    mqc = TWO_WATERS_MQC.format(driver="Hessian").replace("level = 2",
                                                          "level = 1")
    cfg = parse_mqc_string(mqc)
    ref = run_calculation(
        cfg, write_json=False, driver_overrides={"force_dtype": "f64"}
    )[""]
    pol = run_calculation(
        cfg, write_json=False, driver_overrides={"force_dtype": "f32"}
    )[""]
    h_ref = np.asarray(ref.result.hessian)
    h_pol = np.asarray(pol.result.hessian)
    n_ref = float(np.sqrt((h_ref**2).sum()))
    n_pol = float(np.sqrt((h_pol**2).sum()))
    # FD Hessians of polished gradients: norm agreement well under the
    # validation tolerance (raw f32 was off by 0.25)
    assert abs(n_pol - n_ref) < 1e-6
    if ref.vibrational is not None and pol.vibrational is not None:
        f_ref = np.sort(np.asarray(ref.vibrational.frequencies))[-3:]
        f_pol = np.sort(np.asarray(pol.vibrational.frequencies))[-3:]
        assert np.abs(f_pol - f_ref).max() < 0.1  # cm^-1
