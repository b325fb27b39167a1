"""TPU probe: gram-free matvec throughput at north-star sizes.

Validates the lane-packed x1 layout compiles under Mosaic and measures
pair throughput at n = 8192 / 32768 / 100000 (one process, serialized
TPU access, persistent compile cache).
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
    from linpde_gp_tpu.ops.pallas_gram import kernel_term_specs, pallas_gram_matvec

    print(f"backend: {jax.default_backend()}", flush=True)
    k_hh, _ = bench._build_kernels()
    scale, terms = kernel_term_specs(k_hh)
    rng = np.random.default_rng(0)

    for n in (8192, 32768, 100_000):
        X = np.stack(
            [rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], axis=-1
        ).astype(np.float32)
        v = rng.standard_normal(n).astype(np.float32)

        @jax.jit
        def mv(x, w):
            out = pallas_gram_matvec(terms, x, x, w)
            return scale * out if scale != 1.0 else out

        x_dev = jnp.asarray(X)
        v_dev = jnp.asarray(v)
        t0 = time.perf_counter()
        out = mv(x_dev, v_dev)
        _ = np.asarray(out[:4])
        t_cold = time.perf_counter() - t0
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = mv(x_dev, v_dev)
            _ = np.asarray(out[:4])
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(
            f"n={n}: cold {t_cold:.1f} s, steady {t:.4f} s, "
            f"{n * n / t / 1e9:.2f} G pair/s",
            flush=True,
        )
        assert np.all(np.isfinite(np.asarray(out))), "non-finite matvec output"


if __name__ == "__main__":
    main()
