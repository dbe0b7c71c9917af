"""End-to-end driver workflow tests on tiny systems (CPU f64).

Covers: unfragmented/MBE/GMBE x energy/gradient/Hessian dispatch, JSON
output schema, multi-molecule merging, executor bucketing, and the
8-virtual-device mesh path.
"""

import json
import textwrap

import numpy as np
import pytest

from metalquicha_tpu.driver import compute_energy_and_forces, run_calculation
from metalquicha_tpu.io.adapter import CalcType, config_to_driver
from metalquicha_tpu.io.config import parse_mqc_string

TWO_WATERS_MQC = """
%schema
name = mqc-frag
version = 1.0
index_base = 0
units = angstrom
end

%model
method = XTB-GFN1
end

%driver
type = {driver}
end

%structure
charge = 0
multiplicity = 1
end

%geometry
6

O 0.0 0.0 0.117
H 0.0 0.757 -0.471
H 0.0 -0.757 -0.471
O 3.0 0.0 0.117
H 3.0 0.757 -0.471
H 3.0 -0.757 -0.471
end

%fragments
nfrag = 2

%fragment
charge = 0
multiplicity = 1
%indices
0 1 2
end
end

%fragment
charge = 0
multiplicity = 1
%indices
3 4 5
end
end

end  ! fragments

%fragmentation
method = MBE
allow_overlapping_fragments = false
level = 2
embedding = none
end
"""


@pytest.fixture(scope="module")
def water_dimer_cfg():
    return parse_mqc_string(TWO_WATERS_MQC.format(driver="Energy"))


def test_mbe_energy_workflow(tmp_path, monkeypatch, water_dimer_cfg):
    monkeypatch.chdir(tmp_path)
    outputs = run_calculation(water_dimer_cfg, input_path="dimer.mqc")
    out = outputs[""]
    # MBE(2) of a 2-monomer system telescopes to the dimer energy
    assert -12.0 < out.result.total_energy < -9.0
    assert out.result.sum_by_level.sum() == pytest.approx(
        out.result.total_energy
    )
    data = json.loads((tmp_path / "output_dimer.json").read_text())
    obj = data["dimer"]
    assert obj["total_energy"] == pytest.approx(out.result.total_energy)
    levels = obj["levels"]
    assert levels[0]["count"] == 2 and levels[1]["count"] == 1
    assert "dipole" in obj


def test_mbe2_telescopes_to_supersystem(water_dimer_cfg):
    """For a 2-monomer system, MBE(2) total == unfragmented total exactly."""
    outputs = run_calculation(water_dimer_cfg, write_json=False)
    mbe_total = outputs[""].result.total_energy

    cfg_unfrag = parse_mqc_string(
        TWO_WATERS_MQC.format(driver="Energy")
        .replace("%fragments", "%ignore_fragments")
        .replace("end  ! fragments", "end  ! ignore_fragments")
    )
    # crude: drop the fragments section entirely
    cfg_unfrag.fragments = []
    outputs2 = run_calculation(cfg_unfrag, write_json=False)
    assert outputs2[""].result.total_energy == pytest.approx(
        mbe_total, abs=1e-10
    )


def test_gradient_workflow(water_dimer_cfg):
    import copy

    cfg = parse_mqc_string(TWO_WATERS_MQC.format(driver="Gradient"))
    outputs = run_calculation(cfg, write_json=False)
    g = outputs[""].result.gradient
    assert g.shape == (6, 3)
    # forces on a finite system sum to ~zero (translational invariance)
    np.testing.assert_allclose(g.sum(axis=0), 0.0, atol=1e-7)


def test_hessian_workflow_vibrational(tmp_path, monkeypatch):
    mqc = TWO_WATERS_MQC.format(driver="Hessian")
    # single water only (fast): strip to 3 atoms, no fragments
    single = parse_mqc_string(mqc)
    single.fragments = []
    single.geometry.symbols = single.geometry.symbols[:3]
    single.geometry.coords_angstrom = single.geometry.coords_angstrom[:3]
    single.geometry.numbers = single.geometry.numbers[:3]
    monkeypatch.chdir(tmp_path)
    outputs = run_calculation(single, input_path="w1.mqc")
    out = outputs[""]
    assert out.result.hessian.shape == (9, 9)
    assert out.vibrational is not None and out.thermo is not None
    freqs = out.vibrational.frequencies
    assert len(freqs) == 9
    # three real vibrations for water, positive and in a sane range
    assert (freqs[-3:] > 800).all() and (freqs[-3:] < 6000).all()
    data = json.loads((tmp_path / "output_w1.json").read_text())
    obj = data["w1"]
    assert "vibrational_analysis" in obj and "thermochemistry" in obj
    assert obj["thermochemistry"]["zero_point_energy_hartree"] > 0
    assert obj["vibrational_analysis"]["n_modes"] == 9
    assert "hessian_frobenius_norm" in obj


def test_gmbe_pie_workflow(tmp_path, monkeypatch):
    text = textwrap.dedent(
        """
        %schema
        name = mqc-frag
        version = 1.0
        end
        %model
        method = XTB-GFN1
        end
        %driver
        type = Energy
        end
        %structure
        charge = 0
        multiplicity = 1
        end
        %geometry
        4

        H 0.0 0.0 0.0
        H 0.75 0.0 0.0
        H 3.0 0.0 0.0
        H 3.75 0.0 0.0
        end
        %fragments
        nfrag = 2

        %fragment
        %indices
        0 1 2
        end
        end

        %fragment
        %indices
        1 2 3
        end
        end

        end
        %fragmentation
        method = MBE
        allow_overlapping_fragments = true
        level = 1
        end
        """
    )
    cfg = parse_mqc_string(text)
    monkeypatch.chdir(tmp_path)
    outputs = run_calculation(cfg, input_path="ov.mqc")
    res = outputs[""].result
    assert res.pie_coefficients is not None
    table = dict(zip(
        [len(s) for s in outputs[""].pie_atom_sets], res.pie_coefficients
    ))
    assert table == {3: 1, 2: -1}  # two primaries + their overlap
    data = json.loads((tmp_path / "output_ov.json").read_text())
    assert data["ov"]["pie_terms"]["count"] == 3


def test_multi_molecule_merged_json(tmp_path, monkeypatch):
    text = TWO_WATERS_MQC.format(driver="Energy")
    # wrap the single molecule twice
    head, _, tail = text.partition("%structure")
    body = "%structure" + tail
    body = body[: body.index("%fragmentation")]
    multi = head + (
        "%molecules\nnmol = 2\n\n%molecule\n" + body + "end  ! molecule\n\n"
        "%molecule\n" + body + "end  ! molecule\n\nend  ! molecules\n"
    )
    cfg = parse_mqc_string(multi)
    monkeypatch.chdir(tmp_path)
    outputs = run_calculation(cfg, input_path="multi.mqc")
    assert set(outputs) == {"molecule_1", "molecule_2"}
    e1 = outputs["molecule_1"].result.total_energy
    e2 = outputs["molecule_2"].result.total_energy
    assert e1 == pytest.approx(e2, abs=1e-10)
    data = json.loads((tmp_path / "output_multi.json").read_text())
    assert data["multi"]["molecule_1"]["total_energy"] == pytest.approx(e1)


def test_external_calc_interface(water_dimer_cfg):
    from metalquicha_tpu.io.adapter import config_to_system_geometry

    drv = config_to_driver(water_dimer_cfg)
    sys_geom = config_to_system_geometry(water_dimer_cfg)
    e, g, h = compute_energy_and_forces(sys_geom, drv, want_gradient=True)
    assert -12.0 < e < -9.0
    assert g.shape == (6, 3)
    assert h is None


def test_executor_bucketing_and_mesh():
    from metalquicha_tpu.geometry import SystemGeometry, build_fragment_from_indices
    from metalquicha_tpu.parallel.executor import FragmentExecutor
    from metalquicha_tpu.parallel.mesh import fragment_mesh

    import jax

    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices
    mesh = fragment_mesh()
    ex = FragmentExecutor(mesh=mesh)

    # heterogeneous sizes spanning two buckets
    w = np.array([[0.0, 0, 0.2], [0.0, 1.4, -0.9], [0.0, -1.4, -0.9]])
    frags = []
    for i in range(5):
        frags.append((np.array([8, 1, 1]), w + 5.0 * i, 0, 1))
    big = np.concatenate([w, w + [[0, 6, 0]], w + [[6, 0, 0]]])
    frags.append((np.array([8, 1, 1] * 3), big, 0, 1))

    energies, aux = ex.run(frags, what="energy")
    assert energies.shape == (6,)
    # identical monomers -> identical energies
    np.testing.assert_allclose(energies[:5], energies[0], atol=1e-9)
    assert energies[5] < 3 * energies[0] + 0.1  # trimer bound-ish
    # gradients path with per-fragment truncation
    energies2, grads, _ = ex.run(frags, what="gradient")
    np.testing.assert_allclose(energies2, energies, atol=1e-11)
    assert grads[0].shape == (3, 3)
    assert grads[5].shape == (9, 3)


def test_device_count_invariance_mbe2(water_dimer_cfg):
    """MBE(2) totals must be identical on 1, 2, and 8 devices.

    The TPU analog of the reference's serial == mpirun invariant
    (validation runs both; mqc_driver.f90:440-445)."""
    import jax

    from metalquicha_tpu.driver import _make_executor, _run_expansion
    from metalquicha_tpu.io.adapter import config_to_system_geometry
    from metalquicha_tpu.parallel.executor import FragmentExecutor
    from metalquicha_tpu.parallel.mesh import fragment_mesh

    drv = config_to_driver(water_dimer_cfg)
    sys_geom = config_to_system_geometry(water_dimer_cfg)

    totals = []
    for ndev in (1, 2, 8):
        mesh = fragment_mesh(jax.devices()[:ndev])
        ex = FragmentExecutor(mesh=mesh)
        out = _run_expansion(sys_geom, drv, ex)
        totals.append(out.result.total_energy)
    np.testing.assert_allclose(totals, totals[0], atol=1e-10)


def test_group_mesh_topology_and_invariance(water_dimer_cfg):
    """global_groups maps to a ('group','frag') mesh; results unchanged."""
    import jax

    from metalquicha_tpu.driver import _run_expansion
    from metalquicha_tpu.io.adapter import config_to_system_geometry
    from metalquicha_tpu.parallel.executor import FragmentExecutor
    from metalquicha_tpu.parallel.mesh import fragment_mesh

    drv = config_to_driver(water_dimer_cfg)
    sys_geom = config_to_system_geometry(water_dimer_cfg)

    mesh1 = fragment_mesh(jax.devices())
    assert mesh1.axis_names == ("frag",)
    mesh2 = fragment_mesh(jax.devices(), global_groups=2)
    assert mesh2.axis_names == ("group", "frag")
    assert mesh2.devices.shape == (2, 4)
    # nodes_per_group variant and non-divisor rounding
    mesh3 = fragment_mesh(jax.devices(), nodes_per_group=4)
    assert mesh3.devices.shape == (2, 4)
    mesh4 = fragment_mesh(jax.devices(), global_groups=3)  # 3 !| 8 -> 2
    assert mesh4.devices.shape == (2, 4)

    e_ref = _run_expansion(
        sys_geom, drv, FragmentExecutor(mesh=mesh1)
    ).result.total_energy
    e_grp = _run_expansion(
        sys_geom, drv, FragmentExecutor(mesh=mesh2)
    ).result.total_energy
    np.testing.assert_allclose(e_grp, e_ref, atol=1e-10)


def test_multi_molecule_single_executor_pass(monkeypatch):
    """Multi-molecule runs batch all molecules' fragments into ONE
    executor pass (vs the reference's molecule round-robin)."""
    from metalquicha_tpu import driver as drv_mod
    from metalquicha_tpu.parallel.executor import FragmentExecutor

    mqc = MULTI_MOL_MQC if "MULTI_MOL_MQC" in globals() else None
    if mqc is None:
        # reuse the two-water geometry as two separate molecules
        mqc = textwrap.dedent("""
        %schema
        name = mqc-frag
        version = 1.0
        index_base = 0
        units = angstrom
        end

        %model
        method = XTB-GFN1
        end

        %driver
        type = Energy
        end

        %molecules
        nmol = 2

        %molecule
        name = w1
        %structure
        charge = 0
        multiplicity = 1
        end
        %geometry
        3

        O 0.0 0.0 0.117
        H 0.0 0.757 -0.471
        H 0.0 -0.757 -0.471
        end
        end

        %molecule
        name = w2
        %structure
        charge = 0
        multiplicity = 1
        end
        %geometry
        3

        O 9.0 0.0 0.117
        H 9.0 0.757 -0.471
        H 9.0 -0.757 -0.471
        end
        end
        end
        """)
    cfg = parse_mqc_string(mqc)

    calls = []
    orig_run = FragmentExecutor.run

    def counting_run(self, fragments, what="energy"):
        calls.append(len(fragments))
        return orig_run(self, fragments, what)

    monkeypatch.setattr(FragmentExecutor, "run", counting_run)
    outputs = run_calculation(cfg, write_json=False)
    assert set(outputs) == {"w1", "w2"}
    # ONE executor pass containing both molecules' fragments
    assert calls == [2]
    np.testing.assert_allclose(
        outputs["w1"].result.total_energy,
        outputs["w2"].result.total_energy,
        atol=1e-9,
    )
