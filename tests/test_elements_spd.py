"""Element coverage beyond HCNO: spd elements (Na-Ar), spherical d AOs,
and the GFN1 halogen-bond correction."""

import numpy as np

from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
from metalquicha_tpu.geometry import SystemGeometry, build_fragment_from_indices
from metalquicha_tpu.methods.xtb.calculator import XtbCalculator


def _energy(nums, coords_ang, charge=0, mult=None):
    if mult is None:
        mult = 1 if (sum(nums) - charge) % 2 == 0 else 2
    s = SystemGeometry(
        numbers=nums,
        coords=np.array(coords_ang) * ANGSTROM_TO_BOHR,
        charge=charge,
        fragment_atoms=[np.arange(len(nums))],
        fragment_charges=[charge],
        fragment_multiplicities=[mult],
    )
    fr = build_fragment_from_indices(s, [0])
    calc = XtbCalculator(variant="gfn1")
    e, aux = calc.energies(calc.make_batch([fr]))
    return float(np.asarray(e)[0]), float(np.asarray(aux["scf_residual"])[0])


def test_spd_elements_converge_and_bind():
    """Si/S/Na/Cl systems run, converge, and bind with sane magnitudes."""
    e_sih4, r = _energy(
        [14, 1, 1, 1, 1],
        [[0, 0, 0], [0.87, 0.87, 0.87], [-0.87, -0.87, 0.87],
         [0.87, -0.87, -0.87], [-0.87, 0.87, -0.87]],
    )
    assert r < 1e-8
    e_si, _ = _energy([14], [[0, 0, 0]], mult=3)
    e_h, _ = _energy([1], [[0, 0, 0]])
    binding = e_sih4 - e_si - 4 * e_h
    assert -2.0 < binding < -0.2  # bound, not pathological

    e_nacl, r2 = _energy([11, 17], [[0, 0, 0], [0, 0, 2.36]])
    assert r2 < 1e-8
    e_na, _ = _energy([11], [[0, 0, 0]], mult=2)
    e_cl, _ = _energy([17], [[0, 0, 0]], mult=2)
    assert -0.8 < (e_nacl - e_na - e_cl) < -0.05


def test_nacl_water_driver_input():
    """An NaCl + water fragmented input runs end-to-end (VERDICT item 7)."""
    from metalquicha_tpu.driver import run_calculation
    from metalquicha_tpu.io.config import parse_mqc_string

    mqc = """
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

%structure
charge = 0
multiplicity = 1
end

%geometry
5

Na 0.0 0.0 0.0
Cl 0.0 0.0 2.36
O  4.0 0.0 0.0
H  4.0 0.76 0.59
H  4.0 -0.76 0.59
end

%fragments
nfrag = 2

%fragment
charge = 0
multiplicity = 1
%indices
0 1
end
end

%fragment
charge = 0
multiplicity = 1
%indices
2 3 4
end
end

end  ! fragments

%fragmentation
level = 2
end
"""
    cfg = parse_mqc_string(mqc)
    out = run_calculation(cfg, write_json=False)
    e = out[""].result.total_energy
    assert np.isfinite(e) and e < -10.0


def test_halogen_bond_term_prefers_linear():
    """XB term favors linear A-X...D at sigma-hole distances."""
    import jax.numpy as jnp

    from metalquicha_tpu.methods.xtb.xbond import halogen_bond_energy

    rcov = jnp.array([1.88, 0.60, 1.20])  # Cl, H(neighbor), O (Bohr-ish)
    numbers = jnp.array([17, 1, 8])
    kx = jnp.array([0.3, 0.0, 0.0])
    mask = jnp.ones(3)

    def e_at(theta_deg):
        t = np.deg2rad(theta_deg)
        # A(H) at distance 2.4 from X, donor O at 5.6 Bohr from X
        coords = jnp.array([
            [0.0, 0.0, 0.0],
            [2.4 * np.sin(t), 0.0, 2.4 * np.cos(t)],
            [0.0, 0.0, -5.6],
        ])
        return float(halogen_bond_energy(coords, numbers, kx, rcov, mask))

    e_linear = e_at(0.0)    # H-X...D collinear (H opposite D)
    e_bent = e_at(90.0)
    assert e_linear < e_bent
    assert e_linear < 0.0   # attractive at sigma-hole geometry


def test_fourth_row_elements_run():
    """K/Ca/Br/I (ESTIMATED tables) converge with finite energies."""
    e_kbr, r = _energy([19, 35], [[0, 0, 0], [0, 0, 2.82]])
    assert r < 1e-8 and -6.0 < e_kbr < -2.0
    e_ch3i, r2 = _energy(
        [6, 1, 1, 1, 53],
        [[0, 0, 0], [1.03, 0, -0.36], [-0.51, 0.89, -0.36],
         [-0.51, -0.89, -0.36], [0, 0, 2.14]],
    )
    assert r2 < 1e-8 and np.isfinite(e_ch3i)
