"""Gaussian-format basis reader + logger tests."""

import numpy as np
import pytest

from metalquicha_tpu.errors import InputError
from metalquicha_tpu.logging_ import LEVELS, Logger, Timer, get_knowledge
from metalquicha_tpu.methods.basis_sets import (
    build_molecular_basis,
    find_basis_file,
    normalize_basis_name,
    parse_basis_text,
)

STO3G_HO = """
! comment line
H     0
S   3   1.00
      3.42525091             0.15432897
      0.62391373             0.53532814
      0.16885540             0.44463454
****
O     0
S   3   1.00
    130.7093200              0.15432897
     23.8088610              0.53532814
      6.4436083              0.44463454
L   3   1.00
      5.0331513             -0.09996723             0.15591627
      1.1695961              0.39951283             0.60768372
      0.3803890              0.70011547             0.39195739
****
"""


def test_parse_basis_text():
    bases = parse_basis_text(STO3G_HO)
    assert set(bases) == {"H", "O"}
    assert bases["H"].n_shells == 1
    assert bases["H"].shells[0].ang_mom == 0
    assert bases["H"].shells[0].n_primitives == 3
    np.testing.assert_allclose(bases["H"].shells[0].exponents[0], 3.42525091)
    # L shell split into s + p with shared exponents
    assert bases["O"].n_shells == 3
    ls = [sh.ang_mom for sh in bases["O"].shells]
    assert ls == [0, 0, 1]
    np.testing.assert_allclose(
        bases["O"].shells[1].exponents, bases["O"].shells[2].exponents
    )
    np.testing.assert_allclose(bases["O"].shells[2].coefficients[0], 0.15591627)
    # basis function counting: H 1s=1; O: s+s+p = 5
    assert bases["H"].n_basis_functions() == 1
    assert bases["O"].n_basis_functions() == 5


def test_molecular_basis_counts():
    mb = build_molecular_basis(["O", "H", "H"], STO3G_HO)
    assert mb.n_basis_functions() == 7  # STO-3G water


def test_molecular_basis_missing_element():
    with pytest.raises(InputError):
        build_molecular_basis(["C"], STO3G_HO)


def test_declared_primitive_count_enforced():
    bad = "H 0\nS 2 1.00\n 1.0 1.0\n****\n".replace("S 2", "S   2  ")
    with pytest.raises(InputError):
        parse_basis_text(bad)


def test_normalize_and_find():
    assert normalize_basis_name("6-31G*") == "6-31gs"
    assert normalize_basis_name(" cc-pVDZ ") == "cc-pvdz"
    with pytest.raises(InputError):
        find_basis_file("definitely-not-a-basis")


def test_logger_levels(capsys):
    log = Logger("performance")
    log.info("hidden")
    log.performance("timing line")
    log.error("boom")
    out = capsys.readouterr().out
    assert "hidden" not in out
    assert "timing line" in out
    assert "boom" in out
    assert LEVELS["debug"] < LEVELS["verbose"] < LEVELS["info"]
    assert LEVELS["performance"] < LEVELS["warning"] < LEVELS["knowledge"]


def test_timer_and_knowledge(capsys):
    with Timer("phase", Logger("performance")):
        sum(range(1000))
    assert "phase:" in capsys.readouterr().out
    assert isinstance(get_knowledge(), str) and get_knowledge()
