"""Tiled Pallas Gram assembly — the TPU-native replacement for KeOps.

The reference offloads large kernel-matrix reductions to KeOps
(``pykeops`` ``LazyTensor``; consumed at ``covfuncs/_tensor_product.py:
56-62,111-130`` and throughout the Matérn diffop kernels) — a C++/CUDA
lazy map-reduce.  On TPU the equivalent is a Pallas kernel that streams
``(TILE, TILE)`` output tiles through VMEM, evaluating the full
sum-of-products closed form (profile polynomials × exponentials) per tile
with NO HBM intermediates: one pass over the output, everything else in
registers/VMEM.

Covers the entire closed-form kernel family of ``transforms/product.py``
(ExpQuad / half-integer Matérn / TensorProduct and all their diffop
transforms): each factor is ``prefactor * P(t) * exp(-t or -t^2) *
sign^parity`` — entirely VPU ops.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config

# A term spec is a tuple: (coeff, factors) with factors a tuple of
# (kind, scale, poly, parity, prefactor) per input dimension; kind is
# "matern" (t = scale*|d|, exp(-t)) or "expquad" (z = scale*d, exp(-z^2)).
TermSpec = tuple


def _eval_factor_tile(kind, scale, poly, parity, prefactor, d):
    if kind == "matern":
        t = scale * jnp.abs(d)
        res = jnp.full_like(t, poly[-1])
        for c in reversed(poly[:-1]):
            res = res * t + c
        val = res * jnp.exp(-t)
        if parity:
            val = val * jnp.sign(d)
    else:
        z = scale * d
        res = jnp.full_like(z, poly[-1])
        for c in reversed(poly[:-1]):
            res = res * z + c
        val = res * jnp.exp(-(z * z))
    return prefactor * val


@functools.lru_cache(maxsize=None)
def _collapse_terms(terms: tuple) -> tuple:
    """Merge sum-of-products terms into multivariate polynomial groups.

    Terms whose factors share the same per-dimension ``(kind, scale)``
    and parity vector differ only in their polynomial parts, so their
    sum is ONE multivariate polynomial: the sum of outer products of the
    per-factor coefficient vectors (prefactors and the term coefficient
    folded in, accumulated in float64).  Each group then costs a single
    ``exp``/``abs`` per distinct ``(dim, kind, scale)`` plus one nested
    Horner sweep over the coefficient tensor — e.g. the heat operator's
    9-term ``H k H*`` closed form collapses to 3 groups sharing 2
    transcendentals, ~4x fewer VPU ops per pair than evaluating factors
    term by term.

    Returns ``((dims_key, parity, coeff_tensor_nested_tuple), ...)``.
    """
    groups: dict = {}
    order: list = []
    for coeff, factors in terms:
        dims_key = tuple((f[0], float(f[1])) for f in factors)
        # Parity (an explicit sign(d) factor) applies to the |d|-variable
        # families (matern, wendland); expquad polynomials are in the
        # signed variable already.
        parity = tuple(
            int(f[3]) if f[0] in ("matern", "wendland") else 0 for f in factors
        )
        key = (dims_key, parity)
        c = float(coeff)
        tensor = np.asarray([1.0], dtype=np.float64)
        for f in factors:
            c *= float(f[4])
            tensor = np.multiply.outer(tensor, np.asarray(f[2], np.float64))
        tensor = c * tensor[0]
        if key not in groups:
            groups[key] = tensor
            order.append(key)
        else:
            prev = groups[key]
            shape = tuple(max(a, b) for a, b in zip(prev.shape, tensor.shape))
            merged = np.zeros(shape, np.float64)
            merged[tuple(slice(s) for s in prev.shape)] += prev
            merged[tuple(slice(s) for s in tensor.shape)] += tensor
            groups[key] = merged

    def nest(a):
        if a.ndim == 1:
            return tuple(float(v) for v in a)
        return tuple(nest(sub) for sub in a)

    return tuple((key[0], key[1], nest(groups[key])) for key in order)


def _horner_1d(coeffs, t):
    acc = jnp.full_like(t, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = acc * t + c
    return acc


def _horner_nd(C, ts, axis=0):
    """Nested Horner evaluation of a multivariate coefficient tensor."""
    if axis == len(ts) - 1:
        return _horner_1d(C, ts[axis])
    subs = [_horner_nd(sub, ts, axis + 1) for sub in C]
    acc = subs[-1]
    t = ts[axis]
    for s in reversed(subs[:-1]):
        acc = acc * t + s
    return acc


def _horner_1d_ff(coeffs, t, dtype):
    from . import ff

    c_hi, c_lo = ff.ff_const(coeffs[-1], dtype)
    acc = (jnp.full_like(t[0], c_hi), jnp.full_like(t[0], c_lo))
    for c in reversed(coeffs[:-1]):
        c_hi, c_lo = ff.ff_const(c, dtype)
        acc = ff.ff_add_const(ff.ff_mul(acc, t), c_hi, c_lo)
    return acc


def _horner_nd_ff(C, ts, dtype, axis=0):
    from . import ff

    if axis == len(ts) - 1:
        return _horner_1d_ff(C, ts[axis], dtype)
    subs = [_horner_nd_ff(sub, ts, dtype, axis + 1) for sub in C]
    acc = subs[-1]
    t = ts[axis]
    for s in reversed(subs[:-1]):
        acc = ff.ff_add(ff.ff_mul(acc, t), s)
    return acc


def _eval_groups_ff(groups, d_fn):
    """Compensated (float-float) variant of :func:`_eval_groups`.

    ``d_fn(i)`` returns the RAW per-dimension pairwise difference
    operands ``(a_i, b_i)`` (broadcastable); the difference, scaled
    distance, Horner chains, exponentials and term sum are all carried
    in hi/lo pairs (``ops/ff.py``), dropping the per-entry evaluation
    error from ~1e-6 (TPU f32 transcendentals) to ~1e-13.  Returns the
    ``(hi, lo)`` pair so matvec callers can keep both planes through the
    MXU dot.  Rationale + measured noise-floor numbers: PERFORMANCE.md.
    """
    from . import ff

    d_cache: dict = {}
    t_cache: dict = {}
    e_cache: dict = {}
    s_cache: dict = {}

    def dff(i):
        if i not in d_cache:
            a, b = d_fn(i)
            d_cache[i] = ff.two_diff(a, b)
        return d_cache[i]

    acc = None
    for dims_key, parity, C in groups:
        dtype = None
        ts = []
        env = None
        for i, (kind, scale) in enumerate(dims_key):
            tk = (i, kind, scale)
            if tk not in t_cache:
                z = ff.ff_scale(dff(i), scale)
                if kind == "matern":
                    t = ff.ff_abs(z)
                    e = ff.ff_exp(ff.ff_neg(t))
                elif kind == "wendland":
                    t = ff.ff_abs(z)
                    inside = (t[0] < 1.0) | ((t[0] == 1.0) & (t[1] <= 0.0))
                    e = (inside.astype(t[0].dtype), jnp.zeros_like(t[0]))
                else:
                    t = z
                    e = ff.ff_exp(ff.ff_neg(ff.ff_sqr(z)))
                t_cache[tk] = t
                e_cache[tk] = e
            ts.append(t_cache[tk])
            env = e_cache[tk] if env is None else ff.ff_mul(env, e_cache[tk])
            dtype = ts[-1][0].dtype
        val = ff.ff_mul(_horner_nd_ff(C, ts, dtype), env)
        for i, p in enumerate(parity):
            if p:
                if i not in s_cache:
                    s_cache[i] = jnp.sign(dff(i)[0])
                val = (val[0] * s_cache[i], val[1] * s_cache[i])
        acc = val if acc is None else ff.ff_add(acc, val)
    return acc


def _eval_groups(groups, d_fn):
    """Evaluate collapsed polynomial groups given per-dimension pairwise
    differences ``d_fn(i)``; transcendentals memoized across groups."""
    d_cache: dict = {}
    t_cache: dict = {}
    e_cache: dict = {}
    s_cache: dict = {}

    def d(i):
        if i not in d_cache:
            d_cache[i] = d_fn(i)
        return d_cache[i]

    acc = None
    for dims_key, parity, C in groups:
        ts = []
        env = None
        for i, (kind, scale) in enumerate(dims_key):
            tk = (i, kind, scale)
            if tk not in t_cache:
                if kind == "matern":
                    t = scale * jnp.abs(d(i))
                    e = jnp.exp(-t)
                elif kind == "wendland":
                    t = scale * jnp.abs(d(i))
                    e = (t <= 1.0).astype(t.dtype)  # compact support cutoff
                else:
                    t = scale * d(i)
                    e = jnp.exp(-(t * t))
                t_cache[tk] = t
                e_cache[tk] = e
            ts.append(t_cache[tk])
            env = e_cache[tk] if env is None else env * e_cache[tk]
        val = _horner_nd(C, ts) * env
        for i, p in enumerate(parity):
            if p:
                if i not in s_cache:
                    s_cache[i] = jnp.sign(d(i))
                val = val * s_cache[i]
        acc = val if acc is None else acc + val
    return acc


def _tile_kernel_body(terms: Sequence[TermSpec], ndims: int, compensated: bool, x0_ref, x1_ref, out_ref):
    # Layouts (see ``pallas_gram``): x0_ref (d, T0, 128) with the
    # coordinate in lane 0 (slicing lane 0 is free; any other lane index
    # stalls the Mosaic compiler with a cross-lane extract); x1_ref
    # (d, 8, T1) with the coordinate in sublane 0 and POINTS ALONG LANES
    # — 16x less HBM traffic than lane-padding both operands, which
    # dominated wall-clock at N ~ 1e5 (d*n*128*4 bytes re-streamed per
    # row-block).  out_ref: (T0, T1).
    groups = _collapse_terms(tuple(terms))
    if compensated:
        hi, lo = _eval_groups_ff(
            groups,
            lambda i: (x0_ref[i, :, 0][:, None], x1_ref[i, 0, :][None, :]),
        )
        out_ref[:, :] = hi + lo
    else:
        out_ref[:, :] = _eval_groups(
            groups,
            lambda i: x0_ref[i, :, 0][:, None] - x1_ref[i, 0, :][None, :],
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build_pallas_gram(terms, ndims, n0p, n1p, tile0, tile1, dtype_name, interpret, compensated=False):
    from jax.experimental import pallas as pl

    dtype = jnp.dtype(dtype_name)
    body = functools.partial(_tile_kernel_body, terms, ndims, compensated)

    grid = (n0p // tile0, n1p // tile1)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n0p, n1p), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ndims, tile0, 128), lambda i, j: (0, i, 0)),
            pl.BlockSpec((ndims, 8, tile1), lambda i, j: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((tile0, tile1), lambda i, j: (i, j)),
        interpret=interpret,
    )


def _pack_rows(X, n_pad, dtype):
    """(n, d) -> (d, n_pad, 128): coordinate in lane 0 (sublane-major)."""
    d = X.shape[1]
    out = jnp.zeros((d, n_pad, 128), dtype)
    return out.at[:, : X.shape[0], 0].set(X.astype(dtype).T)


def _pack_lanes(X, n_pad, dtype):
    """(n, d) -> (d, 8, n_pad): coordinate in sublane 0, points in lanes."""
    d = X.shape[1]
    out = jnp.zeros((d, 8, n_pad), dtype)
    return out.at[:, 0, : X.shape[0]].set(X.astype(dtype).T)


def pallas_gram(terms, X0: jnp.ndarray, X1: jnp.ndarray, *, interpret: bool | None = None, compensated: bool | None = None) -> jnp.ndarray:
    """Assemble the ``(n0, n1)`` Gram of a sum-of-products kernel.

    ``X0``/``X1``: ``(n, d)`` point arrays (``d >= 1``; scalar-input
    kernels pass ``d = 1``).  ``compensated=True`` evaluates every entry
    in float-float pairs (``ops/ff.py``) — ~1e-13 per-entry error at
    float32 storage cost; defaults to ``config.gram_compensated``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compensated is None:
        compensated = config.gram_compensated
    X0 = jnp.asarray(X0)
    X1 = jnp.asarray(X1)
    if X0.ndim == 1:
        X0 = X0[:, None]
    if X1.ndim == 1:
        X1 = X1[:, None]
    n0, d = X0.shape
    n1 = X1.shape[0]
    dtype = jnp.result_type(X0.dtype, X1.dtype)

    tile0 = min(config.gram_tile, _round_up(n0, 8))
    tile1 = min(config.gram_tile, _round_up(n1, 128))
    n0p = _round_up(n0, tile0)
    n1p = _round_up(n1, tile1)
    X0p = _pack_rows(X0, n0p, dtype)
    X1p = _pack_lanes(X1, n1p, dtype)

    fn = _build_pallas_gram(
        terms, d, n0p, n1p, tile0, tile1, jnp.dtype(dtype).name, interpret,
        bool(compensated),
    )
    out = fn(X0p, X1p)
    return out[:n0, :n1]


def _matvec_body(terms, ndims, compensated, x0_ref, x1_ref, v_ref, out_ref):
    # Gram-free matvec tile: out[i-tile] += (G tile) @ v[j-tile].
    # Accumulates across the j grid dimension (KeOps-reduction mode).
    # Layouts as in _tile_kernel_body: x0 (d, T0, 128) lane-0, x1
    # (d, 8, T1) lane-packed.
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    groups = _collapse_terms(tuple(terms))
    # (T0, r) on the MXU.  Precision HIGHEST is load-bearing: the TPU
    # default routes f32 dots through one bf16 pass (~4e-3 relative
    # error, measured), which breaks CG convergence; the MXU is idle
    # here so the multi-pass f32 product is free.
    hi_prec = jax.lax.Precision.HIGHEST
    if compensated:
        # Both ff planes go through the dot so the effective Gram entries
        # keep their ~1e-13 accuracy (never rounded back to one f32).
        acc_hi, acc_lo = _eval_groups_ff(
            groups,
            lambda i: (x0_ref[i, :, 0][:, None], x1_ref[i, 0, :][None, :]),
        )
        partial = jax.lax.dot_general(
            acc_hi, v_ref[:, :], (((1,), (0,)), ((), ())), precision=hi_prec
        ) + jax.lax.dot_general(
            acc_lo, v_ref[:, :], (((1,), (0,)), ((), ())), precision=hi_prec
        )
    else:
        acc = _eval_groups(
            groups,
            lambda i: x0_ref[i, :, 0][:, None] - x1_ref[i, 0, :][None, :],
        )
        partial = jax.lax.dot_general(
            acc, v_ref[:, :], (((1,), (0,)), ((), ())), precision=hi_prec
        )

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:, :] += partial


@functools.lru_cache(maxsize=None)
def _build_pallas_gram_matvec(terms, ndims, n0p, n1p, tile0, tile1, r, dtype_name, interpret, compensated=False):
    from jax.experimental import pallas as pl

    dtype = jnp.dtype(dtype_name)
    body = functools.partial(_matvec_body, terms, ndims, compensated)
    grid = (n0p // tile0, n1p // tile1)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n0p, r), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ndims, tile0, 128), lambda i, j: (0, i, 0)),
            pl.BlockSpec((ndims, 8, tile1), lambda i, j: (0, 0, j)),
            pl.BlockSpec((tile1, r), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile0, r), lambda i, j: (i, 0)),
        interpret=interpret,
    )


def pallas_gram_matvec(terms, X0, X1, v, *, interpret: bool | None = None, compensated: bool | None = None) -> jnp.ndarray:
    """``K(X0, X1) @ v`` WITHOUT materializing the Gram — O(n0 * n1)
    compute, O(n0 + n1) memory.  The TPU equivalent of KeOps' lazy
    map-reduce (reference consumption sites: SURVEY.md §2 native list).

    ``v``: ``(n1,)`` or ``(n1, r)``.  ``compensated=True`` evaluates the
    streamed Gram entries in float-float pairs and feeds BOTH planes to
    the MXU dot — per-entry error ~1e-13 instead of the ~1e-6 TPU f32
    transcendental floor; defaults to ``config.gram_compensated``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compensated is None:
        compensated = config.gram_compensated
    X0 = jnp.asarray(X0)
    X1 = jnp.asarray(X1)
    if X0.ndim == 1:
        X0 = X0[:, None]
    if X1.ndim == 1:
        X1 = X1[:, None]
    v = jnp.asarray(v)
    vector = v.ndim == 1
    if vector:
        v = v[:, None]
    n0, d = X0.shape
    n1 = X1.shape[0]
    r = v.shape[1]
    rp = _round_up(r, 128)
    dtype = jnp.result_type(X0.dtype, v.dtype)

    tile_cfg = config.matvec_tile_compensated if compensated else config.matvec_tile
    tile0 = min(tile_cfg, _round_up(n0, 8))
    tile1 = min(tile_cfg, _round_up(n1, 128))
    n0p = _round_up(n0, tile0)
    n1p = _round_up(n1, tile1)
    X0p = _pack_rows(X0, n0p, dtype)
    X1p = _pack_lanes(X1, n1p, dtype)
    vp = jnp.zeros((n1p, rp), dtype).at[:n1, :r].set(v.astype(dtype))

    fn = _build_pallas_gram_matvec(
        terms, d, n0p, n1p, tile0, tile1, rp, jnp.dtype(dtype).name, interpret,
        bool(compensated),
    )
    out = fn(X0p, X1p, vp)[:n0, :r]
    return out[:, 0] if vector else out


def kernel_term_specs(kernel) -> tuple[float, tuple] | None:
    """Extract ``(outer_scale, terms)`` from a kernel if it belongs to the
    sum-of-products closed-form family; ``None`` otherwise."""
    from .kernels.arithmetic import ScaledCovarianceFunction
    from .transforms.product import SumOfProductsKernel, transform_product_kernel

    scale = 1.0
    while isinstance(kernel, ScaledCovarianceFunction):
        scale *= kernel.scalar
        kernel = kernel.covfunc
    if isinstance(kernel, SumOfProductsKernel):
        terms = tuple(
            (
                float(c),
                tuple(
                    (f.kind, f.scale, f.poly, f.parity, f.prefactor)
                    for f in factors
                ),
            )
            for c, factors in kernel.terms
        )
        return scale, terms
    # Base kernels: express as the identity transform of themselves.
    sop = transform_product_kernel(kernel, None, None)
    if sop is not None:
        terms = tuple(
            (
                float(c),
                tuple(
                    (f.kind, f.scale, f.poly, f.parity, f.prefactor)
                    for f in factors
                ),
            )
            for c, factors in sop.terms
        )
        return scale, terms
    return None


def gram_matrix(kernel, X0, X1=None) -> jnp.ndarray:
    """Route Gram assembly: Pallas tiled kernel for the closed-form family
    on sufficiently large problems, broadcast evaluation otherwise."""
    X0 = jnp.asarray(X0)
    X1 = X0 if X1 is None else jnp.asarray(X1)
    in_ndim = kernel.input_ndim
    n0 = int(np.prod(X0.shape[: X0.ndim - in_ndim], dtype=np.int64)) if X0.ndim > in_ndim else 1
    n1 = int(np.prod(X1.shape[: X1.ndim - in_ndim], dtype=np.int64)) if X1.ndim > in_ndim else 1
    use_pallas = (
        kernel.output_shape_0 == ()
        and kernel.output_shape_1 == ()
        and n0 * n1 >= config.pallas_gram_threshold
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        spec = kernel_term_specs(kernel)
        if spec is not None:
            scale, terms = spec
            x0 = X0.reshape(n0, -1)
            x1 = X1.reshape(n1, -1)
            out = pallas_gram(terms, x0, x1)
            return scale * out if scale != 1.0 else out
    if (
        kernel.output_shape_0 == ()
        and kernel.output_shape_1 == ()
        and config.use_native_host_engine
        and jax.default_backend() == "cpu"
        and n0 * n1 >= config.native_gram_threshold
    ):
        out = _native_gram(kernel, X0.reshape(n0, -1), X1.reshape(n1, -1))
        if out is not None:
            return out
    return kernel.matrix(X0, X1)


def _native_gram(kernel, x0, x1):
    """Host C++/OpenMP Gram assembly (KeOps-equivalent, ``native/``).

    Works under ``jit`` via ``pure_callback``; float64 end-to-end on the
    host, cast to the caller's dtype on the way back.
    """
    from .. import native

    eng = native.engine_for(kernel)
    if eng is None:
        return None
    dtype = jnp.result_type(x0.dtype, x1.dtype)
    out_shape = jax.ShapeDtypeStruct((x0.shape[0], x1.shape[0]), dtype)

    def _cb(a, b):
        return eng.gram(np.asarray(a, np.float64), np.asarray(b, np.float64)).astype(dtype)

    return jax.pure_callback(_cb, out_shape, x0, x1, vmap_method="sequential")


def gram_matvec(spec, X0, X1, v, *, compensated: bool | None = None) -> jnp.ndarray:
    """Gram-free ``K(X0, X1) @ v`` router for a ``(scale, terms)`` spec:
    Pallas lazy reduction on TPU, the native C++/OpenMP engine on the
    host CPU (above the same size threshold that gates Gram assembly —
    small problems stay in XLA, avoiding per-call host callbacks),
    dense XLA broadcast otherwise.

    Compact-support (Wendland) kernels: this router accepts TRACED point
    arrays, so it cannot sort points or build the static band schedule —
    callers holding CONCRETE points should use :func:`make_banded_matvec`
    (factory) instead for O(n·band) work; both regressor engines
    (``models/iterative.py``, ``parallel/iterative.py``) consult
    :func:`compact_support_radius` and auto-route the banded schedule.
    """
    scale, terms = spec
    backend = jax.default_backend()
    n0 = int(np.prod(jnp.shape(X0)[:1], dtype=np.int64))
    n1 = int(np.prod(jnp.shape(X1)[:1], dtype=np.int64))
    if backend != "tpu":
        use_native = (
            backend == "cpu"
            and config.use_native_host_engine
            and n0 * n1 >= config.native_gram_threshold
        )
        eng = None
        if use_native:
            from .. import native

            eng = native.engine_for_spec(scale, terms)
        if eng is not None:
            X0 = jnp.asarray(X0)
            v = jnp.asarray(v)
            dtype = jnp.result_type(X0.dtype, v.dtype)
            out_shape = jax.ShapeDtypeStruct(X0.shape[:1] + v.shape[1:], dtype)

            def _cb(a, b, w):
                return eng.matvec(
                    np.asarray(a, np.float64),
                    np.asarray(b, np.float64),
                    np.asarray(w, np.float64),
                ).astype(dtype)

            return jax.pure_callback(
                _cb, out_shape, X0, jnp.asarray(X1), v, vmap_method="sequential"
            )
        # Small problem / no host toolchain / non-CPU host backend:
        # dense broadcast evaluation (O(n0*n1) memory but plain XLA —
        # never a device->host round-trip on GPU).
        out = _dense_terms_matvec(terms, jnp.asarray(X0), jnp.asarray(X1), v)
        return scale * out if scale != 1.0 else out
    out = pallas_gram_matvec(terms, X0, X1, v, compensated=compensated)
    return scale * out if scale != 1.0 else out


def compact_support_radius(terms, dim: int = 0) -> float | None:
    """Support radius along input dimension ``dim`` if EVERY term's
    ``dim``-factor is compactly supported (``wendland`` kind: support
    ``|d| <= 1/scale``); ``None`` otherwise.

    The reference routes Wendland through KeOps and never exploits the
    sparsity structurally (``covfuncs/_wendland.py:87-98``); here it
    feeds the banded Pallas schedule below.
    """
    radius = 0.0
    for _coeff, factors in terms:
        f = factors[dim]
        if f[0] != "wendland":
            return None
        radius = max(radius, 1.0 / float(f[1]))
    return radius


def _banded_matvec_body(terms, ndims, compensated, js_ref, x0_ref, x1_ref, v_ref, out_ref):
    # Banded variant of _matvec_body: the j grid dimension walks a
    # per-row-tile WINDOW of column tiles (offsets prefetched in js_ref),
    # not the full column range.  Same layouts; js_ref is scalar-prefetch.
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    groups = _collapse_terms(tuple(terms))
    hi_prec = jax.lax.Precision.HIGHEST
    if compensated:
        acc_hi, acc_lo = _eval_groups_ff(
            groups,
            lambda i: (x0_ref[i, :, 0][:, None], x1_ref[i, 0, :][None, :]),
        )
        partial = jax.lax.dot_general(
            acc_hi, v_ref[:, :], (((1,), (0,)), ((), ())), precision=hi_prec
        ) + jax.lax.dot_general(
            acc_lo, v_ref[:, :], (((1,), (0,)), ((), ())), precision=hi_prec
        )
    else:
        acc = _eval_groups(
            groups,
            lambda i: x0_ref[i, :, 0][:, None] - x1_ref[i, 0, :][None, :],
        )
        partial = jax.lax.dot_general(
            acc, v_ref[:, :], (((1,), (0,)), ((), ())), precision=hi_prec
        )

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:, :] += partial


@functools.lru_cache(maxsize=None)
def _build_banded_matvec(terms, ndims, n0p, n1p, tile0, tile1, band, r, dtype_name, interpret, compensated=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    body = functools.partial(_banded_matvec_body, terms, ndims, compensated)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n0p // tile0, band),
        in_specs=[
            pl.BlockSpec((ndims, tile0, 128), lambda i, j, js: (0, i, 0)),
            pl.BlockSpec((ndims, 8, tile1), lambda i, j, js: (0, 0, js[i] + j)),
            pl.BlockSpec((tile1, r), lambda i, j, js: (js[i] + j, 0)),
        ],
        out_specs=pl.BlockSpec((tile0, r), lambda i, j, js: (i, 0)),
    )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n0p, r), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def _banded_panel_body(terms, ndims, compensated, x0_ref, x1p_ref, vp_ref, out_ref):
    # STATIC-panel banded body (round 5): the js-scalar-prefetch variant
    # is tile-invariant at ~3x of dense pair throughput because its
    # dynamic block indices defeat Mosaic's multi-buffered DMA
    # pipelining (RESULTS.md tile sweep).  Here the per-row-tile column
    # panels are pre-gathered on the host/device into contiguous arrays,
    # so every BlockSpec index map is static.  Single-RHS only: the
    # reduction is a VPU lane-sum against the lane-major v row (no
    # 128-padded MXU dot), and the (tile0, 128) output accumulates the
    # partial replicated across lanes (column 0 is read back).
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    groups = _collapse_terms(tuple(terms))
    v_row = vp_ref[0, 0, :][None, :]  # (1, tile1) lane-major
    if compensated:
        acc_hi, acc_lo = _eval_groups_ff(
            groups,
            lambda i: (x0_ref[i, :, 0][:, None], x1p_ref[0, i, 0, :][None, :]),
        )
        partial = jnp.sum(acc_hi * v_row, axis=1) + jnp.sum(
            acc_lo * v_row, axis=1
        )
    else:
        acc = _eval_groups(
            groups,
            lambda i: x0_ref[i, :, 0][:, None] - x1p_ref[0, i, 0, :][None, :],
        )
        partial = jnp.sum(acc * v_row, axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.broadcast_to(partial[:, None], out_ref.shape)

    @pl.when(j > 0)
    def _():
        out_ref[:, :] += jnp.broadcast_to(partial[:, None], out_ref.shape)


@functools.lru_cache(maxsize=None)
def _build_banded_panel_matvec(terms, ndims, n0p, ntiles0, band, tile0, tile1, dtype_name, interpret, compensated=False):
    from jax.experimental import pallas as pl

    dtype = jnp.dtype(dtype_name)
    body = functools.partial(_banded_panel_body, terms, ndims, compensated)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n0p, 128), dtype),
        grid=(ntiles0, band),
        in_specs=[
            pl.BlockSpec((ndims, tile0, 128), lambda i, j: (0, i, 0)),
            pl.BlockSpec((1, ndims, 8, tile1), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((1, 8, tile1), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((tile0, 128), lambda i, j: (i, 0)),
        interpret=interpret,
    )


def band_windows(X0s, n0_real, c1_sorted, radius, tile0, tile1, n0p):
    """Per-row-tile column-tile windows ``[j_lo, j_hi]`` covering all
    real column points within ``radius`` of the tile's rows.  ``X0s``:
    the (padded-size irrelevant) sorted row points; ``c1_sorted``: the
    sorted dim-0 column coordinates.  Padded slots carry ``v = 0``, so
    only real pairs constrain the band."""
    ntiles0 = n0p // tile0
    j_lo = np.zeros(ntiles0, np.int64)
    j_hi = np.zeros(ntiles0, np.int64)
    for it in range(ntiles0):
        rows = X0s[it * tile0 : min((it + 1) * tile0, n0_real), 0]
        if rows.size == 0:  # fully padded row tile: any valid window
            continue
        a = int(np.searchsorted(c1_sorted, rows.min() - radius, "left"))
        b = int(np.searchsorted(c1_sorted, rows.max() + radius, "right"))
        j_lo[it] = a // tile1
        j_hi[it] = max(b - 1, a) // tile1
    return j_lo, j_hi


def make_banded_matvec(spec, X0, X1, *, radius: float | None = None, interpret: bool | None = None, compensated: bool | None = None):
    """Factory for a banded gram-free matvec ``v -> scale * K(X0, X1) @ v``
    exploiting compact support: points are sorted by input dimension 0 and
    each row tile visits only the contiguous window of column tiles within
    the support radius — O(n0 * band) pair work instead of O(n0 * n1).

    Because the kernel is EXACTLY zero beyond the radius, the band is
    exact (not an approximation): any tile outside it contributes zero.
    ``X0``/``X1`` must be host (concrete) arrays — the band structure is
    static schedule metadata, computed ahead of trace time; the returned
    closure is jittable and takes/returns vectors in the ORIGINAL point
    order.  ``radius`` defaults to the spec's Wendland support along
    dimension 0 (raises if the dim-0 factors are not compactly supported).
    """
    scale, terms = spec
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compensated is None:
        compensated = config.gram_compensated
    X0 = np.asarray(X0)
    X1 = np.asarray(X1)
    if X0.ndim == 1:
        X0 = X0[:, None]
    if X1.ndim == 1:
        X1 = X1[:, None]
    if radius is None:
        radius = compact_support_radius(terms, 0)
        if radius is None:
            raise ValueError(
                "kernel is not compactly supported along dim 0; pass radius="
            )
    n0, d = X0.shape
    n1 = X1.shape[0]
    dtype = jnp.result_type(X0.dtype, jnp.zeros((), config.default_dtype).dtype)

    perm0 = np.argsort(X0[:, 0], kind="stable")
    perm1 = np.argsort(X1[:, 0], kind="stable")
    inv0 = np.argsort(perm0)
    X0s = X0[perm0]
    X1s = X1[perm1]

    tile0 = min(config.banded_tile0 or config.matvec_tile, _round_up(n0, 8))
    tile1 = min(config.banded_tile1 or config.matvec_tile, _round_up(n1, 128))
    if compensated:
        # The ff tile body holds ~2x the (tile0, tile1) temporaries and
        # the panel kernel adds a (tile0, 128) output broadcast: tile0
        # beyond 512 overflows the ~16 MB scoped VMEM (chip-measured:
        # OOM by 916 KB at (1024, 256) compensated).  Performance is
        # tile-invariant here anyway (RESULTS.md sweep).
        tile0 = min(tile0, 512)
    n0p = _round_up(n0, tile0)
    n1p = _round_up(n1, tile1)
    ntiles1 = n1p // tile1
    j_lo, j_hi = band_windows(X0s, n0, X1s[:, 0], radius, tile0, tile1, n0p)
    band = int(np.max(j_hi - j_lo + 1))
    j_start = np.clip(np.minimum(j_lo, ntiles1 - band), 0, None).astype(np.int32)

    js_dev = jnp.asarray(j_start)
    perm1_dev = jnp.asarray(perm1)
    inv0_dev = jnp.asarray(inv0)
    ntiles0 = n0p // tile0
    panel_w = band * tile1
    # Static per-row-tile column panels (the r=1 fast path): gather
    # indices into the PADDED SORTED column layout.
    panel_cols = (
        j_start[:, None].astype(np.int64) * tile1
        + np.arange(panel_w, dtype=np.int64)[None, :]
    )
    panel_cols_dev = jnp.asarray(panel_cols.reshape(-1), jnp.int32)
    _packs: dict = {}
    _panel_packs: dict = {}

    def _packed(dt):
        # The cache holds NUMPY arrays and converts at USE time: this
        # function may first run inside a jax trace (lax.map / jit /
        # while_loop body), where anything jnp-built — even
        # ``jnp.asarray`` of a host constant — is a tracer that must not
        # outlive its trace (measured leak: pcg body -> lax.map reuse).
        key = jnp.dtype(dt).name
        if key not in _packs:
            dnp = np.dtype(key)
            a0 = np.zeros((d, n0p, 128), dnp)
            a0[:, :n0, 0] = X0s.T
            a1 = np.zeros((d, 8, n1p), dnp)
            a1[:, 0, :n1] = X1s.T
            _packs[key] = (a0, a1)
        a0, a1 = _packs[key]
        return jnp.asarray(a0), jnp.asarray(a1)

    def _packed_panels(dt):
        # (ntiles0, d, 8, panel_w) static x1 panel array (numpy-cached,
        # converted at use time — see _packed).
        key = jnp.dtype(dt).name
        if key not in _panel_packs:
            a0, a1 = _packs[key] if key in _packs else (None, None)
            if a1 is None:
                dnp = np.dtype(key)
                a1 = np.zeros((d, 8, n1p), dnp)
                a1[:, 0, :n1] = X1s.T
            panels = a1[:, :, panel_cols]  # (d, 8, ntiles0, panel_w)
            _panel_packs[key] = np.ascontiguousarray(
                np.transpose(panels, (2, 0, 1, 3))
            )
        return jnp.asarray(_panel_packs[key])

    def matvec(v):
        v = jnp.asarray(v)
        vector = v.ndim == 1
        if vector:
            v = v[:, None]
        # Per-call dtype promotion (matches pallas_gram_matvec): a f64
        # ``v`` against f32 default points computes in f64 rather than
        # silently downcasting.
        dt = jnp.result_type(dtype, v.dtype)
        r = v.shape[1]
        vs = jnp.take(v.astype(dt), perm1_dev, axis=0)
        if vector:
            # STATIC-panel VPU path (round 5): no scalar prefetch, so
            # Mosaic pipelines the panel/v streams — the js variant is
            # pinned at ~3x of dense pair throughput by its dynamic
            # block indexing (RESULTS.md tile sweep).
            X0p, _ = _packed(dt)
            X1pan = _packed_panels(dt)
            v_pad = jnp.zeros((n1p,), dt).at[:n1].set(vs[:, 0])
            vpan = v_pad[panel_cols_dev].reshape(ntiles0, panel_w)
            vp = jnp.zeros((ntiles0, 8, panel_w), dt).at[:, 0, :].set(vpan)
            fn = _build_banded_panel_matvec(
                terms, d, n0p, ntiles0, band, tile0, tile1,
                jnp.dtype(dt).name, interpret, bool(compensated),
            )
            out = fn(X0p, X1pan, vp)[:n0, 0]
            if scale != 1.0:
                out = scale * out
            return jnp.take(out, inv0_dev, axis=0)
        X0p, X1p = _packed(dt)
        rp = _round_up(r, 128)
        vp = jnp.zeros((n1p, rp), dt).at[:n1, :r].set(vs)
        fn = _build_banded_matvec(
            terms, d, n0p, n1p, tile0, tile1, band, rp,
            jnp.dtype(dt).name, interpret, bool(compensated),
        )
        out = fn(js_dev, X0p, X1p, vp)[:n0, :r]
        if scale != 1.0:
            out = scale * out
        return jnp.take(out, inv0_dev, axis=0)

    matvec.band_tiles = band
    matvec.total_tiles = ntiles1
    return matvec


def _dense_terms_matvec(terms, X0, X1, v):
    if X0.ndim == 1:
        X0 = X0[:, None]
    if X1.ndim == 1:
        X1 = X1[:, None]
    groups = _collapse_terms(tuple(terms))
    acc = _eval_groups(groups, lambda i: X0[:, None, i] - X1[None, :, i])
    return acc @ v
