"""TPU probe: numerical correctness of the lane-packed Pallas kernels
against a host float64 oracle, plus Nyström-PCG convergence at n=32768.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    if jax.default_backend() == "tpu":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    import bench
    from linpde_gp_tpu.ops.linalg.pcg import (
        landmark_indices,
        nystrom_preconditioner,
        pcg,
    )
    from linpde_gp_tpu.ops.pallas_gram import (
        kernel_term_specs,
        pallas_gram,
        pallas_gram_matvec,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    k_hh, _ = bench._build_kernels()
    scale, terms = kernel_term_specs(k_hh)
    rng = np.random.default_rng(0)

    # --- correctness: matvec + gram vs host float64 oracle at n=2048 ---
    n = 2048
    X = np.stack([rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], -1)
    v = rng.standard_normal(n)

    def host_gram(X0, X1):
        acc = None
        for coeff, factors in terms:
            term = None
            for i, (kind, s, poly, parity, pref) in enumerate(factors):
                d = X0[:, None, i] - X1[None, :, i]
                t = s * np.abs(d)
                r = np.full_like(t, poly[-1])
                for c in reversed(poly[:-1]):
                    r = r * t + c
                val = pref * r * np.exp(-t)
                if parity:
                    val *= np.sign(d)
                term = val if term is None else term * val
            term = coeff * term
            acc = term if acc is None else acc + term
        return scale * acc

    G64 = host_gram(X, X)
    ref_mv = G64 @ v

    Xd = jnp.asarray(X.astype(np.float32))
    vd = jnp.asarray(v.astype(np.float32))
    got_mv = np.asarray(jax.jit(
        lambda x, w: scale * pallas_gram_matvec(terms, x, x, w)
    )(Xd, vd))
    rel = np.max(np.abs(got_mv - ref_mv)) / np.max(np.abs(ref_mv))
    print(f"matvec rel err vs f64 oracle (n={n}): {rel:.3e}", flush=True)
    assert rel < 1e-4, rel

    got_g = np.asarray(jax.jit(
        lambda x: scale * pallas_gram(terms, x, x)
    )(Xd))
    relg = np.max(np.abs(got_g - G64)) / np.max(np.abs(G64))
    print(f"gram rel err vs f64 oracle (n={n}): {relg:.3e}", flush=True)
    assert relg < 1e-4, relg

    # --- PCG convergence at n=32768, rank 1024 ---
    n = 32768
    rank = 1024
    X = np.stack([rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], -1).astype(np.float32)
    Y = rng.standard_normal(n).astype(np.float32)
    idx = np.asarray(landmark_indices(n, rank))

    def _f0(f):
        kind, s, poly, parity, pref = f
        return 0.0 if parity else pref * poly[0]

    diag = scale * sum(
        float(c) * float(np.prod([_f0(f) for f in fs])) for c, fs in terms
    )
    noise_rel = 1e-4

    @jax.jit
    def condition(x, y, z):
        sigma_sq = jnp.asarray(noise_rel * diag, x.dtype)

        def matvec(w):
            return scale * pallas_gram_matvec(terms, x, x, w) + sigma_sq * w

        K_XZ = scale * pallas_gram(terms, x, z)
        K_ZZ = K_XZ[jnp.asarray(idx)]
        M = nystrom_preconditioner(K_XZ, K_ZZ, sigma_sq)
        res = pcg(matvec, y, M=M, tol=1e-5, maxiter=256)
        return res.x, res.iterations, res.relative_residual

    t0 = time.perf_counter()
    w, iters, relres = condition(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(X[idx]))
    _ = np.asarray(w[:4])
    print(
        f"pcg n={n} rank={rank}: {time.perf_counter() - t0:.1f} s (cold), "
        f"iters={int(iters)}, relres={float(relres):.3e}",
        flush=True,
    )
    t0 = time.perf_counter()
    w, iters, relres = condition(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(X[idx]))
    _ = np.asarray(w[:4])
    print(
        f"pcg steady: {time.perf_counter() - t0:.2f} s, iters={int(iters)}, "
        f"relres={float(relres):.3e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
