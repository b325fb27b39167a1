"""TPU probe: why does PCG diverge at n=1e5?

(a) Verify the streaming matvec at n=1e5 against 256 sampled oracle rows
    computed on the host in float64.
(b) Record the PCG residual trajectory (fixed-length scan) at n=1e5.
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
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    import bench
    from linpde_gp_tpu.ops.linalg.pcg import (
        landmark_indices,
        nystrom_preconditioner,
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

    n = 100_000
    rank = 1024
    X = np.stack([rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], -1).astype(np.float32)
    v = rng.standard_normal(n).astype(np.float32)
    Xd, vd = jnp.asarray(X), jnp.asarray(v)

    # (a) matvec vs sampled host-f64 oracle rows.
    out = np.asarray(jax.jit(
        lambda x, w: scale * pallas_gram_matvec(terms, x, x, w)
    )(Xd, vd))
    rows = rng.choice(n, 256, replace=False)

    X64 = X.astype(np.float64)
    v64 = v.astype(np.float64)

    def oracle_rows(rows):
        res = np.zeros(len(rows))
        for a, i in enumerate(rows):
            acc = None
            for coeff, factors in terms:
                term = None
                for dmi, (kind, s, poly, parity, pref) in enumerate(factors):
                    d = X64[i, dmi] - X64[:, dmi]
                    t = s * np.abs(d)
                    rpoly = np.full_like(t, poly[-1])
                    for cc in reversed(poly[:-1]):
                        rpoly = rpoly * t + cc
                    val = pref * rpoly * np.exp(-t)
                    if parity:
                        val *= np.sign(d)
                    term = val if term is None else term * val
                term = coeff * term
                acc = term if acc is None else acc + term
            res[a] = scale * float(acc @ v64)
        return res

    ref = oracle_rows(rows)
    got = out[rows]
    denom = np.max(np.abs(ref))
    print(f"(a) matvec n=1e5 sampled-row rel err: {np.max(np.abs(got - ref)) / denom:.3e}", flush=True)

    # (b) PCG residual trajectory at n=1e5.
    idx = np.asarray(landmark_indices(n, rank))

    def _f0(f):
        kind, s, poly, parity, pref = f
        return 0.0 if parity else pref * poly[0]

    diag = scale * sum(float(c) * float(np.prod([_f0(f) for f in fs])) for c, fs in terms)
    s2 = 1e-2 * diag

    @jax.jit
    def trajectory(x, y, z):
        sigma_sq = jnp.asarray(s2, x.dtype)

        def matvec(w):
            return scale * pallas_gram_matvec(terms, x, x, w) + sigma_sq * w

        K_XZ = scale * pallas_gram(terms, x, z)
        K_ZZ = K_XZ[jnp.asarray(idx)]
        M = nystrom_preconditioner(K_XZ, K_ZZ, sigma_sq)

        def body(state, _):
            xk, r, p, rz = state
            Ap = matvec(p)
            alpha = rz / jnp.vdot(p, Ap)
            xk = xk + alpha * p
            r = r - alpha * Ap
            zk = M(r)
            rz2 = jnp.vdot(r, zk)
            beta = rz2 / rz
            p = zk + beta * p
            return (xk, r, p, rz2), jnp.linalg.norm(r)

        r0 = y
        z0 = M(r0)
        state = (jnp.zeros_like(y), r0, z0, jnp.vdot(r0, z0))
        _, norms = jax.lax.scan(body, state, None, length=48)
        return norms / jnp.linalg.norm(y), jnp.linalg.norm(z0)

    Y = rng.standard_normal(n).astype(np.float32)
    t0 = time.perf_counter()
    norms, z0n = trajectory(Xd, jnp.asarray(Y), jnp.asarray(X[idx]))
    norms = np.asarray(norms)
    print(f"(b) 48-step trajectory in {time.perf_counter() - t0:.1f} s; ||M r0||={float(z0n):.3e}", flush=True)
    for i in range(0, 48, 4):
        print(f"    it {i:3d}: relres {norms[i]:.3e}", flush=True)


if __name__ == "__main__":
    main()
