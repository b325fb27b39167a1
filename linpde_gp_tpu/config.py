"""Global configuration for linpde_gp_tpu.

The reference library pins ``jax_enable_x64`` globally (see
``tests/linpde_gp/conftest.py:1-3`` of the reference).  On TPU, float64 is
software-emulated and slow, so we make precision a first-class, explicit
choice instead:

- ``default_dtype`` tracks ``jax_enable_x64``: float64 when enabled (CPU
  test/verification mode), float32 otherwise (TPU production mode).
- ``cholesky_jitter`` is an explicit nugget added to Gram diagonals before
  factorization.  The reference relies on float64 and ``inset=1e-6`` grid
  hacks instead of a jitter policy; on TPU in float32 an explicit jitter is
  required for near-singular Grams from smooth kernels.
- ``quadrature_order`` replaces the reference's adaptive ``scipy.quad``
  fallback (``linfunctls/_integrals.py:38-57``) with fixed-order
  Gauss-Legendre panels: static shapes, jittable, TPU-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class _Config:
    #: Jitter added to the Gram diagonal before Cholesky (absolute).
    cholesky_jitter: float = 0.0

    #: Number of Gauss-Legendre nodes per panel for quadrature fallbacks.
    quadrature_order: int = 64

    #: Number of quadrature panels per integration domain.
    quadrature_panels: int = 4

    #: Use blockwise (incremental) triangular solves where possible.
    #: Mirrors the reference's ``block_triangular_solves`` probnum config
    #: flag (``linops/_block.py:8-14``).
    block_triangular_solves: bool = True

    #: Tile size used by the Pallas Gram assembly kernels.
    gram_tile: int = 256

    #: Tile size of the Pallas gram-free matvec (both axes).  Larger
    #: tiles amortize the per-tile x1/v re-streaming (the matvec output
    #: is O(n) so HBM traffic is all inputs); bounded by VMEM — the tile
    #: body holds ~6 (tile, tile) f32 temporaries.
    matvec_tile: int = 512

    #: Tile sizes of the BANDED (compact-support) matvec schedule; None
    #: falls back to ``matvec_tile``.  The banded grid walks only the
    #: column-tile window inside the support radius, so its per-grid-step
    #: scheduling floor dominates at small tiles (round-4 measurement:
    #: 2.2-3.0x of the 8.5x tile-ratio bound at N=1e5).  Growing tile0 is
    #: structurally almost free — the window widens by only the row
    #: tile's coordinate SPREAD (~tile0/n of the domain) on top of
    #: 2*radius — and fewer, larger steps amortize the floor.
    banded_tile0: int | None = None
    banded_tile1: int | None = None

    #: Minimum problem size (rows * cols) before the Pallas Gram path is
    #: preferred over plain broadcast evaluation.
    pallas_gram_threshold: int = 1 << 22

    #: Compensated (float-float) streaming Gram evaluation: carry the
    #: distance/Horner/exp chains in hi/lo float32 pairs (``ops/ff.py``),
    #: dropping the coherent evaluation error ||E||_2 from ~3.3e-7*n to
    #: ~2.4e-10*n of k(0) at a measured 5.4x pair-throughput cost (chip
    #: numbers: PERFORMANCE.md round-4 table).  Turn on for small-noise
    #: conditioning at large N (the plain-f32 floor makes the computed
    #: Gram indefinite at ``sigma^2 < ~3e-7 * N * k(0)``).
    gram_compensated: bool = False

    #: Tile size of the compensated matvec (smaller: the ff evaluator
    #: holds ~3x more live VMEM temporaries per tile).
    matvec_tile_compensated: int = 256

    #: Use the JIT-compiled C++/OpenMP host engine (``native/``) for large
    #: Gram assembly and Gram-free matvecs on the CPU backend — the
    #: KeOps-equivalent of the reference (SURVEY.md §2 native list).
    use_native_host_engine: bool = True

    #: Minimum problem size (rows * cols) before the native host engine is
    #: preferred over broadcast XLA evaluation on CPU.
    native_gram_threshold: int = 1 << 20

    #: Mixed-precision conditioning: factor float64 Grams in float32 on
    #: the MXU and recover float64 forward error by preconditioned-CG
    #: iterative refinement (``ops/linalg/refine.py``).  Requires x64.
    solve_refinement: bool = False

    #: Relative-residual target of a refined solve (0 -> ~30 eps of the
    #: high precision, i.e. float64 round-off level).
    refine_tol: float = 0.0

    #: Iteration cap of a refined solve.
    refine_maxiter: int = 400

    #: Relative nugget of the refined (float64) system — eps64-scale,
    #: mirroring the float64 eager escalation path.  The float32 factor
    #: carries its own ~1e-6 nugget; their ratio bounds the
    #: preconditioned spectrum (~1e6 -> O(100) CG iterations).
    refine_target_jitter: float = 1e-12

    #: Relative nugget applied when factoring the float32 copy of a
    #: float64 Gram in refinement mode.
    refine_factor_jitter: float = 1e-6

    #: Host-orchestrated CG (``ops/linalg/pcg.pcg_host``): drive the CG
    #: iteration from the host, calling SEPARATELY jitted device programs
    #: for the Gram matvec and the preconditioner apply, with the O(N)
    #: vector arithmetic in host float64.  Two reasons to turn it on:
    #: (1) rigs whose remote XLA compile service cannot build the fused
    #: while_loop program (matvec + rank-m Nystrom apply in ONE program
    #: at N=1e5/m=4096 aborts the service; each piece alone compiles
    #: fine — measured, CLAUDE.md), and (2) float64 CG vector arithmetic
    #: on float32-only backends for free.  Costs ~2 dispatch floors
    #: (~80 ms on this tunnel) per iteration — noise against a >1 s
    #: streaming matvec at N=1e5.
    host_cg: bool = False

    @property
    def default_dtype(self) -> jnp.dtype:
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def set(self, **kwargs):
        for key, value in kwargs.items():
            if not hasattr(self, key):
                raise AttributeError(f"Unknown config key: {key}")
            setattr(self, key, value)


config = _Config()


def use_x64(enable: bool = True) -> None:
    """Enable float64 globally (CPU verification mode)."""
    jax.config.update("jax_enable_x64", enable)
