"""North-star accuracy: heat-1D conditioned at N=1e5 collocation points,
posterior RMSE vs the ANALYTIC sine-series solution (VERDICT r3 item 3).

Replicates the reference's heat experiment (``0002_heat_1d.ipynb``;
analytic solution ``problems/pde/_heat.py:96``) at gram-free scale:
space-time Matérn TensorProduct prior, ~N heat-operator collocation
observations (zero RHS), IC + BC point observations as the ANCHOR batch
(block Schur elimination, ``models/iterative.py``).  Every O(N²) stage
streams through the Pallas lazy reduction; the compensated float-float
evaluation mode keeps the f32 coherent error floor ~1e3 below plain f32
(measured: ``experiments/gram_noise_floor.py``).

Usage:  python experiments/large_scale_tpu.py            (TPU, N=1e5)
        LS_N=32768 python experiments/large_scale_tpu.py (smaller N)
CPU fallback runs a miniature (N=2048, float64) for logic verification.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"# large_scale: {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    if jax.default_backend() == "tpu":
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass
    jax.config.update("jax_default_matmul_precision", "highest")

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # CPU verification mode

    import jax.numpy as jnp

    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.models.iterative import IterativeGPRegressor
    n_pde = int(os.environ.get("LS_N", 100_000 if on_tpu else 2048))
    # Anchor counts sized to the prior lengthscales (the IC sine and the
    # BC traces are smooth): more anchors only deepen the small-eigenvalue
    # tail of the dense anchor Gram, which f32 Cholesky cannot take.
    n_ic = int(os.environ.get("LS_N_IC", 96 if on_tpu else 64))
    n_bc = int(os.environ.get("LS_N_BC", 48 if on_tpu else 32))
    nq = int(os.environ.get("LS_NQ", 8192 if on_tpu else 512))
    compensated = bool(int(os.environ.get("LS_COMPENSATED", 1))) and on_tpu
    # Relative PDE noise: the f32 streaming-Gram spectral error floor is
    # ~2.4e-10 * N * k_LL(0) compensated (measured, gram_noise_floor) —
    # 1e-3 sits ~40x above it at N=1e5; the CPU miniature runs f64.
    noise_rel = float(os.environ.get("LS_NOISE", 1e-3 if on_tpu else 1e-10))
    # f32 Cholesky of the dense anchor Gram breaks down near
    # eps32 * ||A11|| * O(n1) ~ 1e-5; escalate x10 on non-finite weights.
    anchor_noise = float(os.environ.get("LS_ANCHOR_NOISE", 1e-5 if on_tpu else 1e-12))
    rank = int(os.environ.get("LS_RANK", 4096 if on_tpu else 256))
    tol = float(os.environ.get("LS_TOL", 1e-5 if on_tpu else 1e-11))
    maxiter = int(os.environ.get("LS_MAXITER", 512 if on_tpu else 4000))
    dtype = np.float32 if on_tpu else np.float64

    spatial_domain = lgt.domains.asdomain([-1.0, 1.0])
    ibvp = lgt.problems.HeatEquationDirichletProblem(
        t0=0.0,
        T=5.0,
        spatial_domain=spatial_domain,
        alpha=0.1,
        initial_values=lgt.functions.TruncatedSineSeries(
            spatial_domain, coefficients=[1.0]
        ),
    )
    prior = lgt.GaussianProcess(
        lgt.functions.Zero((2,)),
        1.0 * lgt.kernels.TensorProduct(
            lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
            lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
        ),
    )
    H = ibvp.pde.diffop
    u_star = ibvp.solution  # analytic separation-of-variables solution

    # Collocation: quasi-uniform random interior points (same distribution
    # as bench.py); anchors: IC at t=0 plus both spatial boundaries.
    rng = np.random.default_rng(0)
    X_pde = np.stack(
        [rng.uniform(0.0, 5.0, n_pde), rng.uniform(-1.0, 1.0, n_pde)], axis=-1
    ).astype(dtype)
    Y_pde = np.zeros(n_pde, dtype)  # heat equation: H u = 0

    X_ic = np.stack(
        [np.zeros(n_ic), np.linspace(-1.0, 1.0, n_ic)], axis=-1
    )
    X_bc = np.concatenate(
        [
            np.stack([np.linspace(0.0, 5.0, n_bc), np.full(n_bc, -1.0)], axis=-1),
            np.stack([np.linspace(0.0, 5.0, n_bc), np.full(n_bc, 1.0)], axis=-1),
        ]
    )
    X_anchor = np.concatenate([X_ic, X_bc]).astype(dtype)
    Y_anchor = np.asarray(
        u_star(jnp.asarray(X_anchor, jnp.float64 if not on_tpu else jnp.float32))
    ).astype(dtype)

    # Noise relative to the observed-process diagonal k_HH(0).
    from linpde_gp_tpu.ops.pallas_gram import kernel_term_specs
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    k_hh = apply_operator_to_kernel(
        H, apply_operator_to_kernel(H, prior.cov, argnum=1), argnum=0
    )
    scale, terms = kernel_term_specs(k_hh)

    def _f0(f):
        kind, s, poly, parity, pref = f
        return 0.0 if parity else pref * poly[0]

    diag = scale * sum(
        float(c) * float(np.prod([_f0(f) for f in fs])) for c, fs in terms
    )
    noise_variance = noise_rel * diag

    _log(
        f"n_pde={n_pde} anchors={X_anchor.shape[0]} nq={nq} "
        f"noise={noise_variance:.3e} rank={rank} compensated={compensated}"
    )

    t0 = time.perf_counter()
    for attempt in range(4):
        reg = IterativeGPRegressor(
            prior, X_pde, Y_pde, L=H,
            noise_variance=noise_variance,
            tol=tol, maxiter=maxiter,
            precond_rank=min(rank, n_pde // 4),
            compensated=compensated,
            # Round 5: device-state ff CG + floored device Nystrom build
            # (Schur-corrected for the anchor batch) replace the round-4
            # host-orchestrated loop — same solution, ~6x fewer
            # iterations and scalar-only per-iteration host traffic.
            # LS_DEVICE_CG=0 LS_HOST_CG=1 restores the r4 path.
            host_cg=bool(int(os.environ.get("LS_HOST_CG", 0))) and on_tpu,
            device_cg=bool(int(os.environ.get("LS_DEVICE_CG", 1))) and on_tpu,
            precond_build=os.environ.get(
                "LS_BUILD", "device" if on_tpu else "auto"
            ),
            anchor_X=X_anchor, anchor_Y=Y_anchor, anchor_noise=anchor_noise,
        )
        w = np.asarray(reg.representer_weights[:4])
        iters0, relres0 = reg.solve_info
        # iters==0 with nan relres = NaN rhs (e.g. anchor-Cholesky
        # breakdown upstream), which leaves w at a FINITE all-zero
        # initial guess — catch it too.  A FINITE relres at iters==0 is
        # legitimate 0-iteration convergence (rhs already below
        # tol*||b||), not a failure (ADVICE r4).
        if np.all(np.isfinite(w)) and np.isfinite(relres0) and (
            iters0 > 0 or relres0 <= tol
        ):
            break
        anchor_noise *= 10.0  # f32 anchor-Cholesky breakdown: escalate
        _log(f"non-finite weights; retrying with anchor_noise={anchor_noise:g}")
    t_condition = time.perf_counter() - t0
    assert np.all(np.isfinite(w)), "non-finite representer weights"
    iters, relres = reg.solve_info
    _log(f"conditioned in {t_condition:.1f} s (incl. compile): "
         f"iters={iters} relres={relres:.3e}")

    # Posterior mean on a query grid vs the analytic solution.
    Xq = np.stack(
        [rng.uniform(0.0, 5.0, nq), rng.uniform(-1.0, 1.0, nq)], axis=-1
    ).astype(dtype)
    t0 = time.perf_counter()
    mean_q = np.asarray(reg.mean(jnp.asarray(Xq)))
    t_eval = time.perf_counter() - t0
    truth = np.asarray(u_star(jnp.asarray(Xq, jnp.float64))).reshape(-1)
    err = mean_q.astype(np.float64) - truth
    rmse = float(np.sqrt(np.mean(err**2)))
    max_err = float(np.max(np.abs(err)))
    _log(f"posterior mean at nq={nq}: {t_eval:.1f} s; "
         f"RMSE={rmse:.3e} max|err|={max_err:.3e}")

    print(
        json.dumps(
            {
                "experiment": "heat1d_accuracy_large_scale",
                "n_pde": n_pde,
                "n_anchor": int(X_anchor.shape[0]),
                "noise_variance": noise_variance,
                "compensated": compensated,
                "pcg_iters": iters,
                "pcg_relres": relres,
                "condition_s": round(t_condition, 2),
                "rmse_vs_analytic": rmse,
                "max_err_vs_analytic": max_err,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
