"""Posterior VARIANCE at the north-star scale (VERDICT r4 item 2).

Round 4 never measured posterior std at N=1e5 on the chip — the
host-blocked CG moves O(n*block) buffers through the tunnel every
iteration and the fused device program does not compile at this size.
Round 5's ``pcg_block_ff`` (device-state multi-RHS float-float CG,
``ops/linalg/pcg.py``) removes both obstacles: one shared (n, bs)
streaming mat-mat per iteration, state on device, per-column residual
scalars the only per-iteration host traffic.

Quality gates (the dense N=1e5 oracle cannot exist — 40 GB Gram):
- CPU tier: the same ``var`` path is asserted against the dense oracle
  in ``tests/test_pcg_r5.py`` / ``tests/test_conditioning.py``;
- here: two independent block partitions (bs and bs//2 — different
  Krylov spaces per column group) must agree to ~CG tolerance, and the
  variance must be positive and bounded by the prior variance.

Usage:  python experiments/variance_tpu.py           (TPU, N=1e5)
        VT_N=32768 VT_NQ=1024 python experiments/variance_tpu.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"# variance: {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass
    jax.config.update("jax_default_matmul_precision", "highest")
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.models.iterative import IterativeGPRegressor
    from linpde_gp_tpu.ops import diffops

    n = int(os.environ.get("VT_N", 100_000 if on_tpu else 2048))
    nq = int(os.environ.get("VT_NQ", 2048 if on_tpu else 128))
    bs = int(os.environ.get("VT_BS", 256 if on_tpu else 32))
    rank = int(os.environ.get("VT_RANK", 8192 if on_tpu else 128))
    noise_rel = float(os.environ.get("VT_NOISE", 1e-3))
    tol = float(os.environ.get("VT_TOL", 1e-5 if on_tpu else 1e-8))
    dtype = np.float32 if on_tpu else np.float64

    prior = lgt.GaussianProcess(
        lgt.functions.Zero((2,)),
        1.0 * lgt.kernels.TensorProduct(
            lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
            lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
        ),
    )
    H = diffops.HeatOperator((2,), alpha=0.1)

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

    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], -1).astype(dtype)
    Y = rng.standard_normal(n).astype(dtype)
    Xq = np.stack(
        [rng.uniform(0.0, 5.0, nq), rng.uniform(-1.0, 1.0, nq)], -1
    ).astype(dtype)

    _log(f"n={n} nq={nq} bs={bs} rank={rank} noise={noise_variance:.3e}")
    t0 = time.perf_counter()
    reg = IterativeGPRegressor(
        prior, X, Y, L=H,
        noise_variance=noise_variance, tol=tol, maxiter=512,
        precond_rank=min(rank, n // 4),
        compensated=on_tpu, host_cg=False, device_cg=on_tpu,
        precond_build="device" if on_tpu else "auto",
    )
    w = np.asarray(reg.representer_weights[:4])
    assert np.all(np.isfinite(w))
    t_cond = time.perf_counter() - t0
    iters, relres = reg.solve_info
    _log(f"conditioning: {t_cond:.1f} s, iters={iters} relres={relres:.3e}")

    t0 = time.perf_counter()
    var = np.asarray(reg.var(jnp.asarray(Xq), block_size=bs), np.float64)
    t_var = time.perf_counter() - t0
    _log(f"variance at nq={nq} (bs={bs}): {t_var:.1f} s "
         f"({t_var / max(nq, 1) * 1e3:.1f} ms/query)")

    prior_var = float(prior.cov(jnp.asarray(Xq[:1]))[0])
    assert np.all(var >= 0.0), "negative posterior variance"
    assert np.all(var <= prior_var * (1.0 + 1e-3)), "variance above prior"

    # Consistency gate: an independent block partition must agree.
    nq_chk = min(nq, 4 * bs)
    t0 = time.perf_counter()
    var_chk = np.asarray(
        reg.var(jnp.asarray(Xq[:nq_chk]), block_size=bs // 2), np.float64
    )
    t_chk = time.perf_counter() - t0
    rel = np.max(np.abs(var_chk - var[:nq_chk])) / max(np.max(var[:nq_chk]), 1e-12)
    _log(f"block-partition consistency on {nq_chk} queries: "
         f"rel diff {rel:.3e} ({t_chk:.1f} s)")

    print(json.dumps({
        "experiment": "variance_large_scale",
        "n": n, "nq": nq, "block_size": bs, "rank": min(rank, n // 4),
        "noise_variance": noise_variance,
        "condition_s": round(t_cond, 2), "pcg_iters": int(iters),
        "variance_s": round(t_var, 2),
        "variance_s_per_query_ms": round(t_var / max(nq, 1) * 1e3, 2),
        "partition_consistency_rel": rel,
        "std_range": [float(np.sqrt(var.min())), float(np.sqrt(var.max()))],
        "backend": "tpu" if on_tpu else "cpu",
    }))


if __name__ == "__main__":
    main()
