"""SCF non-convergence must surface as ConvergenceError, never as silent
wrong numbers (parity with the reference's abort on tblite failure,
/root/reference/src/fragmentation/mbe/mqc_mbe_mpi_fragment_distribution_scheme.F90:599-604)."""

import pytest

from metalquicha_tpu.driver import run_calculation
from metalquicha_tpu.errors import ConvergenceError
from metalquicha_tpu.io.config import parse_mqc_string
from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
from metalquicha_tpu.methods.xtb.engine import settings_from_params
from metalquicha_tpu.parallel.executor import FragmentExecutor

from test_driver import TWO_WATERS_MQC


def _crippled_executor():
    """An executor whose SCC cannot converge (1 iteration, no mixing)."""
    settings = settings_from_params("gfn1", max_scf_iter=1, mixer_damping=1.0)
    return FragmentExecutor(XtbCalculator(settings=settings))


def test_stalled_scc_raises():
    cfg = parse_mqc_string(TWO_WATERS_MQC.format(driver="Energy"))
    with pytest.raises(ConvergenceError) as exc:
        run_calculation(cfg, write_json=False, executor=_crippled_executor())
    assert "residual" in str(exc.value)


def test_converged_scc_passes():
    cfg = parse_mqc_string(TWO_WATERS_MQC.format(driver="Energy"))
    outputs = run_calculation(cfg, write_json=False)
    assert outputs[""].result.total_energy < 0.0
