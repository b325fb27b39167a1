"""Driver benchmark: the north-star N=1e5 conditioning wall-clock.

``BASELINE.json`` asks for "Gram build + Cholesky solve wall-clock at
N=1e5" on the heat-operator config.  At N=1e5 the dense float32 Gram is
40 GB and cannot exist on one chip, so the measured quantity is the
equivalent end-to-end conditioning hot path in its gram-free form
(``models/iterative.py``): every CG iteration STREAMS the operator-
transformed Gram ``H k H* (X, X)`` through the tiled Pallas reduction
(O(N²) pair evaluations, O(N) memory — the TPU-native analogue of the
reference's KeOps strategy, SURVEY.md §5), preconditioned by a rank-m
Nyström approximation.  Wall-clock covers: preconditioner construction
(two Pallas Gram blocks + eigendecomposition) + the full PCG solve for
the representer weights.

The reference publishes no performance numbers (BASELINE.md): its stack
is single-process CPU numpy/scipy float64 with a DENSE gram + Cholesky.
``vs_baseline`` therefore reports the speedup over that faithful dense
CPU float64 implementation of the same conditioning problem (measured at
a smaller N and extrapolated by the exact O(N^2) gram / O(N^3) cholesky
scaling laws — an extrapolation, not a measurement; the dense CPU run at
N=1e5 would take ~hours).

Output: one JSON line
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
plus '#'-prefixed diagnostics on stderr (iterations, residual, posterior
eval time).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def _build_kernels():
    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.ops import diffops
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    prior_cov = 1.0 * lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = diffops.HeatOperator((2,), alpha=0.1)
    k_hh = apply_operator_to_kernel(
        H, apply_operator_to_kernel(H, prior_cov, argnum=1), argnum=0
    )
    k_cross = apply_operator_to_kernel(H, prior_cov, argnum=1)
    return k_hh, k_cross


def _accelerator_run(k_hh, k_cross, X, Y, Xq, *, noise_rel, rank, tol, maxiter,
                     compensated=False, host_cg=False, hybrid=False):
    import jax
    import jax.numpy as jnp

    from linpde_gp_tpu.ops.linalg.pcg import (
        NystromPreconditioner,
        landmark_indices,
        make_pcg_ff_programs,
        nystrom_preconditioner,
        nystrom_preconditioner_device,
        nystrom_preconditioner_hybrid,
        pcg,
        pcg_ff,
        pcg_host,
    )
    from linpde_gp_tpu.ops.pallas_gram import (
        kernel_term_specs,
        pallas_gram,
        pallas_gram_matvec,
    )

    n = X.shape[0]
    scale_obs, terms_obs = kernel_term_specs(k_hh)
    scale_cross, terms_cross = kernel_term_specs(k_cross)
    idx = np.asarray(landmark_indices(n, rank))

    # Kernel diagonal k(x, x): factors with a sign(d) parity vanish at 0.
    def _f0(f):
        kind, s, poly, parity, pref = f
        return 0.0 if parity else pref * poly[0]

    diag = scale_obs * sum(
        float(c) * float(np.prod([_f0(f) for f in fs])) for c, fs in terms_obs
    )

    # Mixed-precision PCG (the refine.py recipe at gram-free scale): the
    # O(N²)-pair streaming matvec runs in float32 Pallas, while the CG
    # vector arithmetic and the preconditioner APPLICATION run in float64
    # (O(N) / O(N·m) emulated work — negligible).  Pure-f32 CG stalls at
    # ~6e-4 relative residual on this system (cond ≈ 1.6e7 ≈ 1/eps32,
    # measured); with f64 vectors the floor is the matvec noise (~4e-6).
    hi_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    lo_dtype = jnp.float32

    # Nyström preconditioner build and the CG loop are SEPARATE jits
    # (round 4): the combined program at n=1e5 failed on the remote
    # compile service (r3's rc=124 root cause) while each piece
    # compiles fine; the split also reuses the build across modes.
    @jax.jit
    def build_precond(x, z):
        sigma_sq = jnp.asarray(noise_rel * diag, lo_dtype)
        K_XZ = pallas_gram(terms_obs, x, z)
        if scale_obs != 1.0:
            K_XZ = scale_obs * K_XZ
        K_ZZ = K_XZ[jnp.asarray(idx)]
        M = nystrom_preconditioner(K_XZ, K_ZZ, sigma_sq)
        return M.B, M.chol_C, M.delta

    @jax.jit
    def condition(x, y, B, chol_C, delta):
        from linpde_gp_tpu.ops.linalg.pcg import NystromPreconditioner

        sigma_sq = jnp.asarray(noise_rel * diag, hi_dtype)

        def matvec(v):
            out = pallas_gram_matvec(
                terms_obs, x, x, v.astype(lo_dtype), compensated=compensated
            )
            out = out.astype(hi_dtype)
            if scale_obs != 1.0:
                out = scale_obs * out
            return out + sigma_sq * v

        M = NystromPreconditioner(B, chol_C, delta)
        res = pcg(matvec, y.astype(hi_dtype), M=M, tol=tol, maxiter=maxiter)
        return res.x, res.iterations, res.relative_residual

    # Host-orchestrated CG for the compensated mode (pcg_host): the FUSED
    # while_loop body (ff matvec + rank-4096 Nystrom apply in ONE program)
    # aborts this rig's remote XLA compile service at n=1e5 — measured
    # round 4; each piece alone compiles fine.  The two programs below are
    # exactly those pieces; the O(n) CG vector arithmetic runs on the host
    # in float64 (a precision upgrade over the on-device f32 vectors).
    @jax.jit
    def matvec_only(x, v):
        out = pallas_gram_matvec(terms_obs, x, x, v, compensated=compensated)
        return scale_obs * out if scale_obs != 1.0 else out

    @jax.jit
    def precond_apply(B, chol_C, delta, r):
        from linpde_gp_tpu.ops.linalg.pcg import NystromPreconditioner

        return NystromPreconditioner(B, chol_C, delta)(r)

    def condition_host(x, y, B, chol_C, delta):
        sigma_sq = float(noise_rel * diag)

        def matvec(v):
            return np.asarray(
                matvec_only(x, jnp.asarray(v, lo_dtype)), np.float64
            ) + sigma_sq * v

        res = pcg_host(
            matvec, np.asarray(y, np.float64),
            M=lambda r: precond_apply(B, chol_C, delta, jnp.asarray(r, lo_dtype)),
            tol=tol, maxiter=maxiter,
        )
        return res.x, res.iterations, res.relative_residual

    # -- round-5 upgraded ff path (mode "ff"): host-factorized streamed
    # Nystrom build + device-state float-float CG --------------------------
    # The legacy all-device build's mandatory f32 K_ZZ stabilizer
    # (eps32*trace*m ~ 2x the kernel diagonal at m=4096) ridge-truncates
    # the preconditioner and was the root cause of the 326-iteration
    # round-4 solve (see nystrom_preconditioner_hybrid); the hybrid build
    # restores f64-quality factors and unlocks rank 8192+ (no K_XZ
    # materialization).  pcg_ff keeps CG vectors on device as float-float
    # pairs: ~2 dispatch floors and scalar-only host traffic per
    # iteration vs pcg_host's 4 O(n) copies (VERDICT r4 items 1+3).
    def block_fn(x0, x1):
        out = pallas_gram(terms_obs, x0, x1, compensated=compensated)
        return scale_obs * out if scale_obs != 1.0 else out

    def ff_matvec(aux, v):
        out = pallas_gram_matvec(terms_obs, aux, aux, v, compensated=compensated)
        return scale_obs * out if scale_obs != 1.0 else out

    def ff_precond(aux, r):
        return NystromPreconditioner(*aux)(r)

    _ff_programs = make_pcg_ff_programs(ff_matvec, ff_precond)

    def condition_hybrid(x, y):
        sigma_abs = float(noise_rel * diag)
        # "device" (default): all-device floored build, scalar-only host
        # traffic — the hybrid (host-f64) build's four m^2 tunnel
        # transfers plus 2-core host m^3 math measured ~500 s at m=8192.
        build = (
            nystrom_preconditioner_hybrid
            if os.environ.get("BENCH_BUILD", "device") == "hybrid"
            else nystrom_preconditioner_device
        )
        M = build(
            block_fn, x, jnp.asarray(np.asarray(x)[idx]), sigma_abs,
            chunk=int(os.environ.get(
                "BENCH_CHUNK", max(2048, min(16384, int(6e11 // max(len(idx), 1) ** 2)))
            )),
            # Host-side scalar only (device programs unchanged): the
            # kappa-vs-apply-noise tradeoff knob, see
            # nystrom_preconditioner_device.  Chip-probed: c=4 measures
            # 87.8 s / 49 iters at N=1e5 vs 94.5 s / 53 at c=8; at
            # n=32768 c=8 is better (33 vs 49) — size-dependent, so the
            # default is tuned for the N=1e5 north-star run.
            f32_floor=float(os.environ.get("BENCH_FLOOR", 4.0)),
        )
        res = pcg_ff(
            ff_matvec, ff_precond, x, (M.B, M.chol_C, M.delta),
            y.astype(lo_dtype), sigma_abs, tol=tol, maxiter=maxiter,
            programs=_ff_programs,
        )
        return res.x, res.iterations, res.relative_residual

    @jax.jit
    def posterior_mean_update(xq, x, w):
        out = pallas_gram_matvec(terms_cross, xq, x, w)
        return scale_cross * out if scale_cross != 1.0 else out

    x_dev = jnp.asarray(X)
    y_dev = jnp.asarray(Y)
    z_dev = jnp.asarray(X[idx])
    xq_dev = jnp.asarray(Xq)

    if hybrid:
        def run_once():
            # Build + solve are both timed (the build is work the dense
            # baseline does not have); the hybrid build re-runs its
            # device programs from the warm cache and redoes the m x m
            # host-f64 factorizations each run.
            w, iters, relres = condition_hybrid(x_dev, y_dev)
            wn = np.asarray(w[:8])
            assert np.all(np.isfinite(wn)), "non-finite representer weights"
            # A stalled CG (e.g. an f32-floor regression in the
            # preconditioner) must trip the mode ladder, not ship a
            # non-converged "result".
            if float(relres) > 100.0 * tol:
                raise RuntimeError(
                    f"pcg_ff failed to converge: relres={float(relres):.3e} "
                    f"after {int(iters)} iterations"
                )
            return jnp.asarray(w, lo_dtype), int(iters), float(relres)
    else:
        _log(f"building Nystrom preconditioner (rank {len(idx)}) ...")
        t0 = time.perf_counter()
        B, chol_C, delta = build_precond(x_dev, z_dev)
        _ = np.asarray(B[:2, :2])
        _log(f"preconditioner built in {time.perf_counter() - t0:.1f} s "
             f"(incl. compile)")

        cond_fn = condition_host if host_cg else condition

        def run_once():
            # The preconditioner build is part of the timed conditioning
            # (it is work the dense baseline does not have), re-executed
            # from the warm cache each run.
            B, chol_C, delta = build_precond(x_dev, z_dev)
            w, iters, relres = cond_fn(x_dev, y_dev, B, chol_C, delta)
            # Force a device->host readback: some PJRT transports complete
            # block_until_ready at enqueue time.
            wn = np.asarray(w[:8])
            assert np.all(np.isfinite(wn)), "non-finite representer weights"
            return jnp.asarray(w, lo_dtype), int(iters), float(relres)

    _log(f"compiling / warming condition() at n={n} (host_cg={host_cg}) ...")
    t0 = time.perf_counter()
    w, iters, relres = run_once()
    t_first = time.perf_counter() - t0
    _log(f"first run (incl. compile): {t_first:.1f} s, "
         f"iters={iters} relres={relres:.3e}")

    # Long solves (the compensated mode at n=1e5 runs hundreds of >1 s
    # streaming matvecs) get one steady-state repeat, short ones two —
    # keeps the whole bench inside the driver's window.
    repeats = 1 if t_first > 180.0 else 2
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        w, iters, relres = run_once()
        times.append(time.perf_counter() - t0)
    _log(f"steady-state conditioning: {min(times):.3f} s, iters={iters}, "
         f"relres={relres:.3e}")

    # Posterior-mean evaluation throughput (nq x n streaming cross-Gram).
    t0 = time.perf_counter()
    mu = posterior_mean_update(xq_dev, x_dev, w)
    _ = np.asarray(mu[:8])
    t_eval_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu = posterior_mean_update(xq_dev, x_dev, w)
    _ = np.asarray(mu[:8])
    t_eval = time.perf_counter() - t0
    _log(f"posterior mean eval at nq={Xq.shape[0]}: {t_eval:.3f} s "
         f"(cold {t_eval_cold:.1f} s)")

    return min(times), iters, relres, t_eval


def _cpu_baseline_seconds(k_hh, n_target, noise_rel):
    """Reference-style CPU float64 dense gram+chol, extrapolated."""
    from linpde_gp_tpu.ops.pallas_gram import kernel_term_specs

    scale, terms = kernel_term_specs(k_hh)
    n_base = int(os.environ.get("BENCH_CPU_N", 4096))
    rng = np.random.default_rng(0)
    X = rng.uniform(-1.0, 1.0, (n_base, 2))
    Y = rng.standard_normal(n_base)

    def eval_factor(kind, s, poly, parity, pref, d):
        if kind == "matern":
            t = s * np.abs(d)
            res = np.full_like(t, poly[-1])
            for c in reversed(poly[:-1]):
                res = res * t + c
            val = res * np.exp(-t)
            if parity:
                val = val * np.sign(d)
        else:
            z = s * d
            res = np.full_like(z, poly[-1])
            for c in reversed(poly[:-1]):
                res = res * z + c
            val = res * np.exp(-(z * z))
        return pref * val

    t0 = time.perf_counter()
    acc = None
    cache = {}
    for coeff, factors in terms:
        term = None
        for i, spec in enumerate(factors):
            key = (i, spec)
            if key not in cache:
                d = X[:, None, i] - X[None, :, i]
                cache[key] = eval_factor(*spec, d)
            val = cache[key]
            term = val if term is None else term * val
        term = coeff * term
        acc = term if acc is None else acc + term
    gram = scale * acc
    gram = gram + (noise_rel * np.mean(np.diag(gram))) * np.eye(n_base)
    t_gram = time.perf_counter() - t0

    t0 = time.perf_counter()
    import scipy.linalg

    chol = scipy.linalg.cholesky(gram, lower=True)
    scipy.linalg.cho_solve((chol, True), Y)
    t_chol = time.perf_counter() - t0

    r = n_target / n_base
    return t_gram * r**2 + t_chol * r**3


def _enable_persistent_cache():
    """Persist compiled executables across bench invocations — remote
    compiles through the PJRT tunnel can take minutes cold."""
    import jax

    if jax.default_backend() != "tpu":
        return  # CPU cache entries are machine-specific (SIGILL risk)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _mode_params(mode: str, n: int, on_tpu: bool) -> dict:
    """Benchmark configurations, most accurate first.

    - ``ff``: compensated float-float Gram evaluation (``ops/ff.py``) —
      per-entry error ~1e-13, so realistic noise 1e-3 conditions fine at
      the north-star n=1e5 (the plain-f32 coherent error floor would
      force 10% noise there; see PERFORMANCE.md).
    - ``ffh``: the round-4 proven ff program (legacy all-device build,
      rank 4096, host-orchestrated CG) — kept warm in the persistent
      cache as the first fallback rung.
    - ``plain``: the round-2 known-good program — plain f32 streaming
      evaluation, noise ``max(3e-2, 3n/1e6)`` (the measured f32 noise
      floor), rank-1024 Nystrom.  Always kept as the fail-safe fallback
      so the driver captures a number even if the ff program regresses.
    """
    if mode == "ff":
        # Round 5: hybrid (host-f64-factorized, streamed) Nystrom build
        # + device-state float-float CG.  Rank 8192 is the predicted
        # iteration sweet spot (lambda_8192/sigma^2 ~ 6 at n=1e5,
        # experiments/precond_spectroscopy.py) and fits HBM because the
        # streamed build never materializes K_XZ.
        return dict(
            compensated=on_tpu,
            host_cg=False,
            hybrid=True,
            noise_rel=float(os.environ.get("BENCH_NOISE", 1e-3)),
            rank=int(os.environ.get("BENCH_RANK", 8192 if on_tpu else 128)),
        )
    if mode == "ffh":
        return dict(
            compensated=on_tpu,
            # Host-driven CG on TPU: the fused while_loop body of this
            # mode kills the rig's remote compile service at n=1e5
            # (measured r4); the split per-iteration programs compile.
            host_cg=bool(int(os.environ.get("BENCH_HOST_CG", 1))) and on_tpu,
            hybrid=False,
            noise_rel=float(os.environ.get("BENCH_NOISE", 1e-3)),
            rank=int(os.environ.get("BENCH_RANK", 4096 if on_tpu else 128)),
        )
    return dict(
        compensated=False,
        host_cg=False,
        hybrid=False,
        noise_rel=float(os.environ.get("BENCH_NOISE", max(3e-2, 3.0 * n / 1e6))),
        rank=int(os.environ.get("BENCH_RANK", 1024 if on_tpu else 128)),
    )


def main():
    import jax

    # Full-f32 matmuls inside eigh/triangular_solve — the TPU bf16
    # matmul default corrupts the preconditioner.  (Global x64 is NOT an
    # option here: Pallas index maps trace to i64 under x64 and Mosaic
    # fails to legalize them, and f64 matmuls crash this XLA's
    # TransposeFolding pass — both observed on the chip.)
    jax.config.update("jax_default_matmul_precision", "highest")

    _enable_persistent_cache()

    on_tpu = jax.default_backend() == "tpu"
    n = int(os.environ.get("BENCH_N", 100_000 if on_tpu else 2048))
    nq = int(os.environ.get("BENCH_NQ", 8192 if on_tpu else 512))
    # Fail-safe mode ladder (VERDICT r3 item 1): try the compensated
    # small-noise program first, and on ANY failure retry the SAME N
    # with the round-2 known-good plain-f32 program in a fresh process
    # (a device fault poisons this process's PJRT client).  Only when
    # every mode fails at N do we halve N.
    compensated = bool(int(os.environ.get("BENCH_COMPENSATED", 1)))
    default_modes = "ff,ffh,plain" if (compensated and on_tpu) else "plain"
    modes = [m for m in os.environ.get("BENCH_MODES", default_modes).split(",") if m]
    mode = modes[0]
    params = _mode_params(mode, n, on_tpu)
    noise_rel = params["noise_rel"]
    rank = params["rank"]
    tol = float(os.environ.get("BENCH_TOL", 1e-5))
    maxiter = int(os.environ.get("BENCH_MAXITER", 512))

    k_hh, k_cross = _build_kernels()
    rng = np.random.default_rng(0)
    dtype = np.float32 if on_tpu else np.float64

    def make_data(n):
        # Space-time collocation points (uniform over the heat domain).
        X = np.stack(
            [rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], axis=-1
        ).astype(dtype)
        Y = rng.standard_normal(n).astype(dtype)
        Xq = np.stack(
            [rng.uniform(0.0, 5.0, nq), rng.uniform(-1.0, 1.0, nq)], axis=-1
        ).astype(dtype)
        return X, Y, Xq

    value = None
    min_n = min(n, 4096)
    _log(f"mode={mode} n={n} noise={noise_rel:g} rank={rank} "
         f"(ladder: {','.join(modes)})")
    try:
        X, Y, Xq = make_data(n)
        value, iters, relres, t_eval = _accelerator_run(
            k_hh, k_cross, X, Y, Xq,
            noise_rel=noise_rel, rank=min(rank, n // 4),
            tol=tol, maxiter=maxiter, compensated=params["compensated"],
            host_cg=params["host_cg"], hybrid=params["hybrid"],
        )
    except Exception as exc:  # noqa: BLE001
        _log(f"mode={mode} N={n} failed ({type(exc).__name__}: {exc})")
        # A failed remote compile / device fault poisons THIS process's
        # PJRT client (every later call returns UNAVAILABLE, observed on
        # the axon tunnel) — retry in a FRESH process: first the next
        # mode at the SAME N (the plain program is warm in the
        # persistent cache), only then a smaller N.
        if os.environ.get("BENCH_NO_RETRY", "0") != "1":
            import subprocess

            if len(modes) > 1:
                _log(f"falling back to mode={modes[1]} at N={n} (fresh process)")
                env = dict(os.environ, BENCH_MODES=",".join(modes[1:]))
            elif n // 2 >= min_n:
                _log(f"retrying N={n // 2} plain in a fresh process")
                env = dict(
                    os.environ, BENCH_N=str(n // 2), BENCH_MODES="plain"
                )
            else:
                raise
            ret = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env
            )
            sys.exit(ret.returncode)
    if value is None:
        raise RuntimeError("benchmark failed at every problem size")
    baseline = _cpu_baseline_seconds(k_hh, n, noise_rel)
    _log(
        f"extrapolated dense CPU f64 baseline at n={n}: {baseline:.0f} s "
        f"({baseline / 3600.0:.2f} h)"
    )

    print(
        json.dumps(
            {
                # Mode is part of the metric: "ff" = compensated
                # float-float evaluation at noise 1e-3 (precision-parity
                # conditioning); "plain" = plain-f32 at the 10%-noise
                # f32 floor (throughput mode, round-2 configuration).
                "metric": f"heat_LkL_pcg_condition_n{n}_{mode}",
                "value": round(value, 6),
                "unit": "s",
                "vs_baseline": round(baseline / value, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
