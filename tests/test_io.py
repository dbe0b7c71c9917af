"""I/O tests: .mqc parsing, JSON->mqc prep round-trip, xyz reading, adapter.

Mirrors the reference test strategy for config_parser/config_adapter/xyz
(reference test/test_mqc_config_parser.f90 and friends).
"""

import json
import os
import textwrap

import numpy as np
import pytest

from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
from metalquicha_tpu.errors import InputError
from metalquicha_tpu.io import config as cfgmod
from metalquicha_tpu.io import prep
from metalquicha_tpu.io.adapter import (
    CalcType,
    MethodType,
    calc_type_from_string,
    config_to_driver,
    config_to_system_geometries,
    config_to_system_geometry,
    method_type_from_string,
)
from metalquicha_tpu.io.xyz import read_xyz_string

WATER_XYZ = """3
water
O 0.0 0.0 0.117
H 0.0 0.757 -0.471
H 0.0 -0.757 -0.471
"""

MINIMAL_MQC = """
%schema
name = mqc-frag
version = 1.0
index_base = 0
units = angstrom
end  ! schema

%model
method = XTB-GFN1
end

%driver
type = Energy
end

%structure
charge = 1
multiplicity = 1
end

%geometry
3

O 0.0 0.0 0.117
H 0.0 0.757 -0.471
H 0.0 -0.757 -0.471
end  ! geometry
"""


def test_xyz_reader():
    geom = read_xyz_string(WATER_XYZ)
    assert geom.n_atoms == 3
    assert list(geom.numbers) == [8, 1, 1]
    assert geom.comment == "water"
    np.testing.assert_allclose(geom.coords_angstrom[1], [0.0, 0.757, -0.471])


def test_xyz_reader_count_mismatch():
    with pytest.raises(InputError):
        read_xyz_string("5\nbad\nO 0 0 0\n")


def test_minimal_parse():
    cfg = cfgmod.parse_mqc_string(MINIMAL_MQC)
    assert cfg.schema_name == "mqc-frag"
    assert cfg.method == "XTB-GFN1"
    assert cfg.charge == 1
    assert cfg.geometry.n_atoms == 3


def test_unknown_section_skipped():
    text = MINIMAL_MQC + "\n%bogus\nstuff = 1\nend\n"
    cfg = cfgmod.parse_mqc_string(text)
    assert cfg.geometry.n_atoms == 3


def test_missing_schema_rejected():
    with pytest.raises(InputError):
        cfgmod.parse_mqc_string("%geometry\n1\n\nH 0 0 0\nend\n")


def test_comment_stripping():
    text = MINIMAL_MQC.replace("charge = 1", "charge = 1  ! inline comment")
    cfg = cfgmod.parse_mqc_string(text)
    assert cfg.charge == 1


def test_fragments_and_connectivity():
    text = MINIMAL_MQC + textwrap.dedent(
        """
        %fragments
        nfrag = 2

        %fragment
        charge = 0
        multiplicity = 1
        %indices
        0 1
        end  ! indices
        end  ! fragment

        %fragment
        charge = 1
        multiplicity = 2
        %indices
        2
        end  ! indices
        end  ! fragment

        end  ! fragments

        %connectivity
        nbonds = 2

        0 1 1
        1 2 1 broken

        nbroken = 1
        end  ! connectivity

        %fragmentation
        method = MBE
        allow_overlapping_fragments = false
        level = 2
        %cutoffs
        2 = 5.0
        3 = 4.0
        end  ! cutoffs
        end  ! fragmentation
        """
    )
    cfg = cfgmod.parse_mqc_string(text)
    assert len(cfg.fragments) == 2
    assert cfg.fragments[1].charge == 1
    assert cfg.fragments[1].indices == [2]
    assert len(cfg.bonds) == 2
    assert cfg.bonds[1].is_broken
    assert cfg.cutoffs == {2: 5.0, 3: 4.0}
    assert cfg.level == 2


def test_nfrag_mismatch_rejected():
    text = MINIMAL_MQC + (
        "\n%fragments\nnfrag = 3\n\n%fragment\n%indices\n0 1 2\nend\nend\nend\n"
    )
    with pytest.raises(InputError):
        cfgmod.parse_mqc_string(text)


def test_index_base_one_normalized():
    text = MINIMAL_MQC.replace("index_base = 0", "index_base = 1") + (
        "\n%fragments\nnfrag = 1\n\n%fragment\n%indices\n1 2 3\nend\nend\nend\n"
    )
    cfg = cfgmod.parse_mqc_string(text)
    assert cfg.fragments[0].indices == [0, 1, 2]


def test_calc_and_method_enums():
    assert calc_type_from_string("Hessian") == CalcType.HESSIAN
    assert calc_type_from_string("energy") == CalcType.ENERGY
    assert method_type_from_string("XTB-GFN1") == MethodType.GFN1
    assert method_type_from_string("gfn2-xtb") == MethodType.GFN2
    assert method_type_from_string("ccsd(t)") == MethodType.CCSD_T
    with pytest.raises(InputError):
        method_type_from_string("nope")


def test_adapter_unfragmented_becomes_single_monomer():
    cfg = cfgmod.parse_mqc_string(MINIMAL_MQC)
    sys_geom = config_to_system_geometry(cfg)
    assert sys_geom.n_monomers == 1
    assert sys_geom.charge == 1
    np.testing.assert_allclose(
        sys_geom.coords[0, 2], 0.117 * ANGSTROM_TO_BOHR, rtol=1e-14
    )
    drv = config_to_driver(cfg)
    assert drv.nlevel == 0
    assert drv.calc_type == CalcType.ENERGY


def test_adapter_overlap_rejected():
    text = MINIMAL_MQC + (
        "\n%fragments\nnfrag = 2\n\n"
        "%fragment\n%indices\n0 1\nend\nend\n\n"
        "%fragment\n%indices\n1 2\nend\nend\n\nend\n"
    )
    cfg = cfgmod.parse_mqc_string(text)
    with pytest.raises(InputError):
        config_to_system_geometry(cfg)
    # Allowed when overlapping fragments are enabled (GMBE)
    cfg.allow_overlapping_fragments = True
    sys_geom = config_to_system_geometry(cfg)
    assert sys_geom.n_monomers == 2


def test_prep_roundtrip(tmp_path):
    xyz = tmp_path / "w.xyz"
    xyz.write_text(WATER_XYZ)
    data = {
        "schema": {"name": "mqc-frag", "version": "1.0"},
        "molecules": [
            {
                "xyz": str(xyz),
                "fragments": [[0], [1, 2]],
                "fragment_charges": [0, 0],
                "fragment_multiplicities": [1, 1],
                "molecular_charge": 0,
                "molecular_multiplicity": 1,
            }
        ],
        "model": {"method": "XTB-GFN1", "basis": "cc-pVDZ"},
        "keywords": {
            "scf": {"maxiter": 300, "tolerance": 1e-6},
            "fragmentation": {
                "method": "MBE",
                "level": 2,
                "cutoffs": {"2": 5.0},
            },
        },
        "driver": "Gradient",
    }
    jpath = tmp_path / "in.json"
    jpath.write_text(json.dumps(data))
    out = prep.prep_file(str(jpath))
    assert os.path.exists(out)
    cfg = cfgmod.read_mqc_file(out)
    assert cfg.driver_type == "Gradient"
    assert len(cfg.fragments) == 2
    assert cfg.fragments[1].indices == [1, 2]
    assert cfg.cutoffs == {2: 5.0}
    drv = config_to_driver(cfg)
    assert drv.calc_type == CalcType.GRADIENT
    assert drv.nlevel == 2


def test_multi_molecule_parse(tmp_path):
    text = MINIMAL_MQC.split("%structure")[0] + textwrap.dedent(
        """
        %molecules
        nmol = 2

        %molecule
        name = alpha
        %structure
        charge = 0
        multiplicity = 1
        end
        %geometry
        1

        He 0.0 0.0 0.0
        end
        end  ! molecule

        %molecule
        %structure
        charge = 0
        multiplicity = 1
        end
        %geometry
        1

        Ne 0.0 0.0 0.0
        end
        end  ! molecule

        end  ! molecules
        """
    )
    cfg = cfgmod.parse_mqc_string(text)
    assert len(cfg.molecules) == 2
    assert cfg.molecules[0].name == "alpha"
    geoms = config_to_system_geometries(cfg)
    assert geoms[0][0] == "alpha"
    assert geoms[1][0] == "molecule_2"
    assert geoms[1][1].numbers[0] == 10


def test_parse_reference_format_compat():
    """Parse a .mqc generated in the exact reference emitter layout."""
    text = textwrap.dedent(
        """\
        %schema
        name = mqc-frag
        version = 1.0
        index_base = 0
        units = angstrom
        end  ! schema

        %model
        method = XTB-GFN1
        basis = cc-pVDZ
        aux_basis = cc-pVDZ-RIFIT
        end  ! model

        %driver
        type = Energy
        end  ! driver

        %system
        log_level = Verbose
        end  ! system

        %structure
        charge = 1
        multiplicity = 1
        end  ! structure

        %geometry
        4

        O 1.0925940942 -0.1960118985 0.1054113976
        H 2.070017178 -0.0708506168 0.0091166421
        H 0.7807135018 -0.418286727 -0.8074994503
        H 0.7408717471 0.7134153793 0.273464383
        end  ! geometry

        %scf
        maxiter = 300
        tolerance = 1e-06
        end  ! scf

        %fragmentation
        method = MBE
        allow_overlapping_fragments = false
        level = 2
        embedding = none
        cutoff_method = distance
        distance_metric = min
        end  ! fragmentation
        """
    )
    cfg = cfgmod.parse_mqc_string(text)
    assert cfg.charge == 1
    assert cfg.scf_maxiter == 300
    assert cfg.scf_tolerance == 1e-06
    assert cfg.geometry.n_atoms == 4
    assert cfg.log_level == "Verbose"
    drv = config_to_driver(cfg)
    assert drv.method.method_type == MethodType.GFN1
    assert drv.method.verbose


def test_legacy_cli_parser():
    """Legacy <xyz> <basis> parser (mqc_cli_parser.f90:29-96)."""
    import pytest as _pytest

    from metalquicha_tpu.errors import ParseError
    from metalquicha_tpu.io.cli_parser import (
        CliArgs,
        HelpRequested,
        parse_command_line,
    )

    args = parse_command_line(["w.xyz", "cc-pvdz"])
    assert args == CliArgs("w.xyz", "cc-pvdz")
    with _pytest.raises(HelpRequested):
        parse_command_line(["--help"])
    with _pytest.raises(ParseError):
        parse_command_line(["only_one"])
    with _pytest.raises(ParseError):
        parse_command_line(["a", "b", "c"])


def test_method_config_families_roundtrip():
    """dft/mcscf/correlation/cc/f12 config structs exist with the
    reference's defaults (mqc_method_config.f90:66-223)."""
    from metalquicha_tpu.io.adapter import MethodConfig

    mc = MethodConfig()
    assert mc.dft.functional == "b3lyp"
    assert mc.dft.dispersion_type == "d3bj"
    assert mc.mcscf.pt2_type == "nevpt2"
    assert mc.mcscf.ipea_shift == 0.25
    assert mc.corr.local_type == "dlpno"
    assert abs(mc.corr.scs_ss - 1.0 / 3.0) < 1e-15
    assert mc.cc.perturbative_triples is True
    assert mc.f12.ansatz == "3c"
    assert mc.use_spherical is True


def test_verbose_breakdown_output():
    """Per-fragment XYZ + deltaE breakdown at verbose level
    (mqc_mbe_io.f90:48-155)."""
    import io

    import numpy as np

    from metalquicha_tpu.frag.mbe_io import (
        get_frag_level_name,
        print_detailed_breakdown,
    )
    from metalquicha_tpu.logging_ import global_logger as logger

    assert get_frag_level_name(2) == "dimers"
    assert get_frag_level_name(11) == "11-mers"

    old_level, old_stream = logger.level, logger.stream
    logger.set_level("verbose")
    logger.stream = io.StringIO()
    try:
        polymers = np.array([[0, -1], [1, -1], [0, 1]])
        print_detailed_breakdown(
            polymers, np.array([-1.0, -2.0, -3.1]), np.array([0, 0, -0.1]), 2
        )
        text = logger.stream.getvalue()
    finally:
        logger.level = old_level
        logger.stream = old_stream
    assert "Monomers (2 fragments):" in text
    assert "Dimers (1 fragments):" in text
    assert "Fragment [1,2]" in text and "deltaE:" in text
