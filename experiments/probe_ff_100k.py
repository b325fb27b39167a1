"""Isolate the N=1e5 compensated-bench failure (round 4).

The full ff condition() program is green at n=32768 but faults at
n=100000.  Stages, each in its own try block so one fault still reports
the others (the PJRT client is poisoned after a fault, so run stages in
separate processes: PROBE_STAGE=matvec|nystrom|cg).
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
    from linpde_gp_tpu.ops.linalg.pcg import landmark_indices, nystrom_preconditioner
    from linpde_gp_tpu.ops.pallas_gram import (
        kernel_term_specs,
        pallas_gram,
        pallas_gram_matvec,
    )

    stage = os.environ.get("PROBE_STAGE", "matvec")
    n = int(os.environ.get("PROBE_N", 100_000))
    rank = int(os.environ.get("PROBE_RANK", 4096))
    print(f"# probe_ff: stage={stage} n={n} rank={rank}", flush=True)

    k_hh, _ = bench._build_kernels()
    scale, terms = kernel_term_specs(k_hh)
    rng = np.random.default_rng(0)
    X = np.stack(
        [rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], axis=-1
    ).astype(np.float32)
    v = rng.standard_normal(n).astype(np.float32)
    x_dev = jnp.asarray(X)
    v_dev = jnp.asarray(v)

    if stage == "matvec":
        fn = jax.jit(
            lambda a, w: pallas_gram_matvec(terms, a, a, w, compensated=True)
        )
        t0 = time.perf_counter()
        out = fn(x_dev, v_dev)
        head = np.asarray(out[:4])
        print(f"# probe_ff: ff matvec at n={n} OK in "
              f"{time.perf_counter() - t0:.1f} s (head {head[:2]})", flush=True)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(x_dev, v_dev)
            _ = np.asarray(out[:4])
            times.append(time.perf_counter() - t0)
        print(f"# probe_ff: steady {min(times):.3f} s = "
              f"{n * n / min(times) / 1e9:.1f} G pair/s", flush=True)
    elif stage == "nystrom":
        idx = np.asarray(landmark_indices(n, rank))
        z_dev = jnp.asarray(X[idx])

        @jax.jit
        def build(x, z):
            K_XZ = pallas_gram(terms, x, z)
            K_ZZ = K_XZ[jnp.asarray(idx)]
            M = nystrom_preconditioner(K_XZ, K_ZZ, jnp.float32(1e-3))
            return M.B[:4, :4], M.chol_C[:4, :4], M.delta

        t0 = time.perf_counter()
        b, c, d = build(x_dev, z_dev)
        print(f"# probe_ff: nystrom rank={rank} at n={n} OK in "
              f"{time.perf_counter() - t0:.1f} s (delta={float(d):.3e})",
              flush=True)
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
