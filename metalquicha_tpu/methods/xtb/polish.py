"""f64 host polish of f32-device fragment results (mixed precision).

The production TPU path runs the SCC in float32 (this TPU has no f64
``linalg.solve``), which leaves raw energies 1e-4..4e-3 Ha off the f64
parity path (TPU_ACCURACY.md). The energy functional is VARIATIONAL in
the shell charges, so an O(eps) f32 charge error costs only O(eps^2)
energy error when the functional is re-evaluated in f64 at (a few damped
refinements of) the f32-converged charges — measured 1e-12 Ha at k=4
(TPU_ACCURACY.md "Mitigation"). Gradients inherit the same property:
the variational gradient is evaluated at the stop-gradient'ed refined
charges, so one f64 gradient evaluation per fragment (no f64 SCC) gives
f64-accurate forces — which makes FD Hessians and frequencies f64-exact
too, since the driver assembles them from these gradients.

The reference has no analog: its results are f64 everywhere
(/root/reference/src/methods/mqc_method_xtb.f90); this module is what
makes the TPU port's results independent of the execution platform.

Process model: the TPU device does the SCC iteration work in f32; the
host CPU pays k damped refinement steps + one functional (or gradient)
evaluation per fragment in f64, batched with vmap. Both platforms live
in one process (``jax_platforms="axon,cpu"`` with x64 enabled and an
explicitly-f32 device calculator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .calculator import XtbCalculator, single_point_energy

#: damped f64 refinement steps from the f32-converged charges. k=4 already
#: reaches ~1e-11 Ha (TPU_ACCURACY.md); 6 buys slack for slowly-contracting
#: fragments (charged clusters) at negligible host cost.
POLISH_ITERS = 6


def host_polish_available() -> bool:
    """True when a CPU backend exists next to the default device."""
    try:
        return len(jax.devices("cpu")) > 0
    except RuntimeError:
        return False


class HostPolisher:
    """Re-evaluates fragment observables in f64 on the host CPU.

    Built from the device calculator so variant/settings/solvation stay
    identical; only dtype, device placement and the in-loop solver differ
    (Pallas/SP2 are TPU-only — the polish does exact f64 eighs).
    """

    def __init__(self, device_calc: XtbCalculator, k: int = POLISH_ITERS):
        self.k = int(k)
        self.cpu = jax.devices("cpu")[0]
        settings = device_calc.settings
        if hasattr(settings, "use_pallas_eigh") and settings.use_pallas_eigh:
            settings = settings._replace(use_pallas_eigh=False)
        self.calc64 = XtbCalculator(
            settings=settings,
            variant=device_calc.variant,
            dtype=jnp.float64,
            solvation=device_calc.solvation,
        )
        self._jits = {}

    def supports(self) -> bool:
        # GFN1 refines the shell-charge vector; GFN2 refines the packed
        # AES state (engine.scf_refine_multipole) — both wired
        return True

    def _fn(self, what: str):
        key = what
        try:
            return self._jits[key]
        except KeyError:
            pass
        settings = self.calc64.settings
        solvation = self.calc64.solvation
        k = self.k

        def e_of(coords, frag, q0):
            return single_point_energy(
                coords, frag, settings, solvation,
                diff_scf_iters=k, q_init=q0,
            )

        if what == "energy":
            fn = jax.jit(jax.vmap(e_of))
        else:
            def e_and_g(coords, frag, q0):
                (e, aux), g = jax.value_and_grad(
                    e_of, argnums=0, has_aux=True
                )(coords, frag, q0)
                return e, g, aux

            fn = jax.jit(jax.vmap(e_and_g))
        self._jits[key] = fn
        return fn

    def rescue(self, tuples, pad_to, what: str):
        """FULL f64 host SCC for fragments whose f32 device SCC failed.

        The polish's k damped refinements assume a CONVERGED f32 starting
        point; a diverged device SCC (slow-contracting fragments — GMBE
        coincident-cap intersections, highly charged clusters — can
        oscillate in f32) hands it garbage charges. Those fragments are
        re-solved from scratch in f64 on the host with the full iteration
        budget, exactly like the CPU parity path. The batch is padded to a
        fixed quantum so repeated rescues of 1-2 stragglers reuse one
        compiled program per bucket shape.
        """
        RESCUE_PAD = 8
        dummy = (np.array([1]), np.zeros((1, 3)), 0, 2)
        n_real = len(tuples)
        tuples = list(tuples) + [dummy] * ((-n_real) % RESCUE_PAD)
        frag = self.calc64.make_batch(tuples, pad_to=pad_to)
        frag = jax.device_put(frag, self.cpu)
        if what == "gradient":
            e, g, aux = self.calc64.gradients(frag)
        else:
            e, aux = self.calc64.energies(frag)
            g = None
        e = np.asarray(e)[:n_real]
        g = np.asarray(g)[:n_real] if g is not None else None
        aux = {
            k: np.asarray(v)[:n_real]
            for k, v in aux.items()
        }
        return e, g, aux

    def polish(self, tuples, pad_to, shell_charges, what: str):
        """Polished (energies[, gradients], aux) for one padded chunk.

        tuples/pad_to are the executor's host-side batch description;
        shell_charges is the device aux['shell_charges'] (f32, same
        shell padding as the chunk).
        """
        frag = self.calc64.make_batch(tuples, pad_to=pad_to)
        frag = jax.device_put(frag, self.cpu)
        q0 = jax.device_put(
            jnp.asarray(np.asarray(shell_charges), dtype=jnp.float64),
            self.cpu,
        )
        fn = self._fn(what)
        if what == "gradient":
            e, g, aux = fn(frag.coords, frag, q0)
            return e, g, aux
        e, aux = fn(frag.coords, frag, q0)
        return e, None, aux
