#!/usr/bin/env python3
"""Headline benchmark: GFN1-xTB fragment energies/sec on one chip.

Workload: the MBE(2) water-cluster kernel — a padded batch of water dimers
(6 atoms, 16 AOs each), single-point energies, steady-state throughput.
Target (BASELINE.md): >= 1000 fragment energies/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FRAGS_PER_SEC = 1000.0  # driver north-star for a v5p-8 chip


def _probe_default_backend(timeout_s: float = 180.0) -> bool:
    """True if the default (axon TPU) backend initializes in a subprocess.

    The round-3 bench died rc=1 on a wedged TPU tunnel ("Unable to
    initialize backend 'axon'"), and jax.devices() can also hang FOREVER on
    a wedge — so probe in a child process. The child is never killed (a
    SIGTERM'd TPU client mid-init is what wedges the tunnel in the first
    place); on timeout it is abandoned and the bench falls back to CPU so
    the artifact still parses.
    """
    import subprocess
    import time

    child = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; d = jax.devices(); print(d[0].platform, flush=True)"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        rc = child.poll()
        if rc is not None:
            if rc != 0:
                return False
            out = (child.stdout.read() or "").strip()
            return out not in ("", "cpu")
        time.sleep(1.0)
    # abandoned, NOT killed — see docstring
    print(f"bench: backend probe still hanging after {timeout_s:.0f}s; "
          f"falling back to cpu", file=sys.stderr)
    return False


def main() -> int:
    import numpy as np

    platform = os.environ.get("BENCH_PLATFORM", "")
    if not platform:
        platform = "default" if _probe_default_backend() else "cpu"

    # TPU path: f32 compute (f64 unsupported in hardware); the validation
    # suite separately checks f64 numerics on CPU.
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        # single host core: shrink the workload so the fallback artifact
        # lands in minutes, not hours (sizes still honest in the output)
        os.environ.setdefault("BENCH_BATCH", "64")
        os.environ.setdefault("BENCH_GRAD_BATCH", "32")
        os.environ.setdefault("BENCH_ITERS", "2")

    f64 = os.environ.get("BENCH_F64", "0") == "1"
    if f64:
        jax.config.update("jax_enable_x64", True)
    # TPU f32 matmuls default to bf16 passes; SCC needs true f32 to converge
    jax.config.update("jax_default_matmul_precision", "highest")

    from metalquicha_tpu.constants import ANGSTROM_TO_BOHR
    from metalquicha_tpu.methods.xtb.calculator import XtbCalculator
    from metalquicha_tpu.methods.xtb.engine import settings_from_params
    import jax.numpy as jnp

    w = (
        np.array(
            [[0.0, 0.0, 0.117], [0.0, 0.757, -0.471], [0.0, -0.757, -0.471]]
        )
        * ANGSTROM_TO_BOHR
    )
    rng = np.random.default_rng(0)

    def dimer(i):
        sep = 5.5 + 0.3 * rng.random()
        c1 = w + rng.normal(0, 0.05, (1, 3))
        c2 = w + rng.normal(0, 0.05, (1, 3)) + np.array([[sep, 0, 0]])
        return (np.array([8, 1, 1, 8, 1, 1]), np.vstack([c1, c2]), 0, 1)

    batch_size = int(os.environ.get("BENCH_BATCH", "512"))
    n_iters = int(os.environ.get("BENCH_ITERS", "8"))

    # production default is 32 SCC iterations (limits.py / tblite parity);
    # the energy headline keeps 16 (converged to <1e-5 for these dimers,
    # asserted below) with the full-production setting benched separately
    scf_iters = int(os.environ.get("BENCH_SCF_ITERS", "16"))
    # Pallas batched-Jacobi eigh in the SCC loop: ~2.9x over XLA's eigh at
    # these AO dims (disable with BENCH_PALLAS=0 for the XLA-only number)
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1" and not f64
    calc = XtbCalculator(
        settings_from_params(
            "gfn1", max_scf_iter=scf_iters, use_pallas_eigh=use_pallas
        ),
        dtype=jnp.float64 if f64 else jnp.float32,
    )
    frag = calc.make_batch([dimer(i) for i in range(batch_size)])

    # warmup/compile
    e, aux = calc.energies(frag)
    e.block_until_ready()

    # vary coordinates each iteration so no dispatch-level caching can hide
    # work; perturbations are tiny so SCF behavior stays comparable
    coords0 = np.asarray(frag.coords)
    variants = [
        frag._replace(coords=jnp.asarray(coords0 + 1e-6 * (i + 1)))
        for i in range(n_iters)
    ]
    for v in variants:
        v.coords.block_until_ready()

    t0 = time.perf_counter()
    for v in variants:
        e, aux = calc.energies(v)
    e.block_until_ready()
    dt = time.perf_counter() - t0

    frags_per_sec = batch_size * n_iters / dt
    max_resid = float(np.abs(np.asarray(aux["scf_residual"])).max())
    assert max_resid < 1e-5, f"SCF not converged in bench: {max_resid}"

    # secondary metric (BASELINE.md): batched symmetric eigh TFLOP/s at the
    # SCC hot-loop shape and at a larger MXU-friendly shape. FLOP convention:
    # 9*N^3 per matrix (QR-algorithm nominal count).
    def eigh_tflops(nmat, n, iters=4):
        a = jnp.asarray(
            rng.normal(size=(nmat, n, n)).astype(
                np.float64 if f64 else np.float32
            )
        )
        a = a + jnp.swapaxes(a, -1, -2)
        eigh = jax.jit(jnp.linalg.eigh)
        # pre-staged distinct inputs: eager adds in the timed loop would
        # each cost a tunnel round-trip (see density_secs)
        staged = [a * (1.0 + 1e-4 * (i + 1)) for i in range(iters + 1)]
        for x in staged:
            x.block_until_ready()
        w, v = eigh(staged[0])
        v.block_until_ready()
        t0 = time.perf_counter()
        for x in staged[1:]:
            w, v = eigh(x)
        v.block_until_ready()
        dt_e = time.perf_counter() - t0
        return 9.0 * nmat * n**3 * iters / dt_e / 1e12

    eigh_small = eigh_tflops(512, 16)   # bench dimer AO dimension
    eigh_large = eigh_tflops(64, 256)   # large-fragment regime

    # SP2 purification (ops/sp2.py): the in-loop density builder the f32
    # path uses ABOVE the Pallas Jacobi ceiling (engine.PALLAS_EIGH_MAX_N).
    # Head-to-head at the large-fragment shape: time to produce the density
    # matrix from a batch of Fock matrices, eigh-route vs SP2-route. SP2 is
    # 48 batched (N,N) matmuls -> pure MXU work; eigh is latency-bound.
    def density_secs(nmat, n, route, iters=10):
        from metalquicha_tpu.ops.sp2 import sp2_density

        dt_ = np.float64 if f64 else np.float32
        a = rng.normal(size=(nmat, n, n)).astype(dt_)
        a = jnp.asarray(a + a.transpose(0, 2, 1))
        nocc = jnp.full((nmat,), float(2 * (n // 4)), a.dtype)
        nuhf = jnp.zeros((nmat,), a.dtype)
        mask = jnp.ones((nmat, n), a.dtype)

        if route == "eigh":
            @jax.jit
            def density(m):
                w_, v_ = jnp.linalg.eigh(m)
                occ = jnp.arange(n)[None, :] < (nocc[:, None] / 2.0)
                f_ = jnp.where(occ, 2.0, 0.0).astype(m.dtype)
                return jnp.einsum("bik,bk,bjk->bij", v_, f_, v_)
        else:
            @jax.jit
            def density(m):
                return sp2_density(m, nocc, nuhf, mask)

        # pre-stage DISTINCT device inputs (the axon backend caches
        # identical-buffer executions) so the timed loop does no eager
        # op-by-op work — each eager dispatch costs a tunnel round-trip
        # (~25 ms) that would swamp a ~5 ms kernel
        staged = [a * (1.0 + 1e-4 * (i + 1)) for i in range(iters + 3)]
        for x in staged:
            x.block_until_ready()
        for x in staged[:3]:
            density(x).block_until_ready()
        t0_ = time.perf_counter()
        for x in staged[3:]:
            out = density(x)
        out.block_until_ready()
        return (time.perf_counter() - t0_) / iters

    sp2_t = density_secs(64, 256, "sp2")
    eigh_t = density_secs(64, 256, "eigh")
    sp2_speedup = eigh_t / sp2_t
    # effective TFLOP/s of the SP2 route (48 matmuls x 2N^3 + trace work)
    sp2_tflops = 48 * 2.0 * 64 * 256**3 / sp2_t / 1e12

    # Pallas batched-Jacobi: the in-loop eigensolver production f32 runs
    # actually use at N <= engine.PALLAS_EIGH_MAX_N (the eigh_tflops_*
    # numbers above are stock XLA — the path production AVOIDS). Same
    # 9 N^3 nominal-FLOP convention so the columns are comparable.
    def jacobi_pair(nmat, n, iters=8):
        from metalquicha_tpu.ops.jacobi_eigh import batched_jacobi_eigh

        dt_ = np.float64 if f64 else np.float32
        a = rng.normal(size=(nmat, n, n)).astype(dt_)
        a = jnp.asarray(a + a.transpose(0, 2, 1))
        routes = {
            "jacobi": jax.jit(lambda m: batched_jacobi_eigh(m)),
            "eigh": jax.jit(jnp.linalg.eigh),
        }
        secs = {}
        for name, fn in routes.items():
            staged = [a * (1.0 + 1e-4 * (i + 1)) for i in range(iters + 2)]
            for x in staged:
                x.block_until_ready()
            for x in staged[:2]:
                w_, v_ = fn(x)
                v_.block_until_ready()
            t0_ = time.perf_counter()
            for x in staged[2:]:
                w_, v_ = fn(x)
            v_.block_until_ready()
            secs[name] = (time.perf_counter() - t0_) / iters
        tflops = 9.0 * nmat * n**3 / secs["jacobi"] / 1e12
        return tflops, secs["eigh"] / secs["jacobi"]

    if use_pallas:
        jac_small = jacobi_pair(512, 16)    # bench dimer AO dimension
        jac_large = jacobi_pair(128, 64)    # Jacobi ceiling shape
    else:
        jac_small = jac_large = (0.0, 0.0)

    # --- production-path metrics -----------------------------------------
    # (a) value_and_grad throughput at the PRODUCTION 32-iteration setting:
    # the quantity MBE gradient/Hessian workloads are made of
    grad_batch = int(os.environ.get("BENCH_GRAD_BATCH", "256"))
    calc_prod = XtbCalculator(
        settings_from_params(
            "gfn1", max_scf_iter=32, use_pallas_eigh=use_pallas
        ),
        dtype=jnp.float64 if f64 else jnp.float32,
    )
    frag_g = calc_prod.make_batch([dimer(i) for i in range(grad_batch)])
    e, g, auxg = calc_prod.gradients(frag_g)
    g.block_until_ready()
    coords_g = np.asarray(frag_g.coords)
    var_g = [
        frag_g._replace(coords=jnp.asarray(coords_g + 1e-6 * (i + 1)))
        for i in range(n_iters)
    ]
    for v in var_g:
        v.coords.block_until_ready()
    t0 = time.perf_counter()
    for v in var_g:
        e, g, auxg = calc_prod.gradients(v)
    g.block_until_ready()
    dt_g = time.perf_counter() - t0
    grads_per_sec = grad_batch * n_iters / dt_g
    grad_resid = float(np.abs(np.asarray(auxg["scf_residual"])).max())
    assert grad_resid < 1e-5, f"production SCC not converged: {grad_resid}"

    # (b) end-to-end MBE(2) production pass: 20-water cluster -> 20 monomers
    # + 190 dimers through the REAL executor (bucketing, padding, host
    # assembly, device dispatch), energies + gradients + weighted assembly.
    from metalquicha_tpu.parallel.executor import FragmentExecutor

    def w20_frags(jitter):
        centers = np.array(
            [[6.0 * (i % 5), 6.0 * ((i // 5) % 4), 6.0 * (i // 20)]
             for i in range(20)]
        )
        monos = [
            (np.array([8, 1, 1]), w + centers[i] + jitter, 0, 1)
            for i in range(20)
        ]
        dims = []
        for a in range(20):
            for b in range(a + 1, 20):
                za, ca, *_ = monos[a]
                zb, cb, *_ = monos[b]
                dims.append((np.concatenate([za, zb]),
                             np.vstack([ca, cb]), 0, 1))
        return monos + dims

    ex = FragmentExecutor(calc_prod)
    ex.run(w20_frags(np.zeros(3)), what="gradient")  # warm/compile
    t0 = time.perf_counter()
    mbe_iters = 3
    for i in range(mbe_iters):
        e_all, g_all, aux_all = ex.run(
            w20_frags(np.full(3, 1e-5 * (i + 1))), what="gradient"
        )
    dt_mbe = time.perf_counter() - t0
    mbe2_wall = dt_mbe / mbe_iters
    # weighted assembly sanity (monomer weight 1-19, dimer weight 1)
    total_mbe = float(
        -18.0 * sum(e_all[:20]) + sum(e_all[20:])
    )

    print(
        json.dumps(
            {
                "metric": "gfn1_fragment_energies_per_sec",
                "value": round(frags_per_sec, 2),
                "unit": "fragments/s",
                "vs_baseline": round(frags_per_sec / BASELINE_FRAGS_PER_SEC, 3),
                "platform": jax.devices()[0].platform,
                "batch_size": batch_size,
                "scf_residual": max_resid,
                "gfn1_fragment_gradients_per_sec": round(grads_per_sec, 2),
                "grad_scf_residual": grad_resid,
                "mbe2_w20_grad_wall_s": round(mbe2_wall, 3),
                "mbe2_w20_total_ha": round(total_mbe, 6),
                "eigh_tflops_b512_n16": round(eigh_small, 4),
                "eigh_tflops_b64_n256": round(eigh_large, 4),
                "sp2_density_speedup_b64_n256": round(sp2_speedup, 2),
                "sp2_tflops_b64_n256": round(sp2_tflops, 4),
                "jacobi_tflops_b512_n16": round(jac_small[0], 4),
                "jacobi_speedup_b512_n16": round(jac_small[1], 2),
                "jacobi_tflops_b128_n64": round(jac_large[0], 4),
                "jacobi_speedup_b128_n64": round(jac_large[1], 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
