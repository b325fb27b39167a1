"""Mesh-sharded Gram assembly.

The ``N x N`` operator-transformed Gram is sharded over a 2-D device
mesh: row points are split over the ``rows`` axis, column points over
``cols``, and every device evaluates exactly its own tile with the local
closed-form kernel — zero communication (the TPU-native replacement for
KeOps' shared-memory reduction; SURVEY.md §2 "parallelism" checklist).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas_gram import kernel_term_specs, pallas_gram


def _eval_terms(scale, terms, x0, x1):
    """Dense sum-of-products evaluation on local tiles (jnp, fusible),
    via the collapsed multivariate-polynomial groups (shared
    transcendentals, nested Horner)."""
    from ..ops.pallas_gram import _collapse_terms, _eval_groups

    groups = _collapse_terms(tuple(terms))
    acc = _eval_groups(groups, lambda i: x0[:, None, i] - x1[None, :, i])
    return scale * acc


def sharded_gram(kernel, X0, X1=None, *, mesh: Mesh) -> jnp.ndarray:
    """Assemble ``k(X0, X1)`` with output sharded ``(rows, cols)`` over
    the mesh.  Falls back to replicated dense assembly for kernels outside
    the closed-form family."""
    X0 = jnp.asarray(X0).reshape((-1,) + kernel.input_shape)
    X1 = X0 if X1 is None else jnp.asarray(X1).reshape((-1,) + kernel.input_shape)
    spec = kernel_term_specs(kernel)
    if spec is None:
        return kernel.matrix(X0, X1)
    scale, terms = spec
    x0 = X0.reshape(X0.shape[0], -1)
    x1 = X1.reshape(X1.shape[0], -1)

    # 2-D meshes tile both point sets; 1-D meshes shard rows only.
    names = mesh.axis_names
    rows = names[0]
    cols = names[1] if len(names) > 1 else None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(rows, None), P(cols, None)),
        out_specs=P(rows, cols),
    )
    def assemble(x0_local, x1_local):
        if jax.default_backend() == "tpu" and x0_local.shape[0] * x1_local.shape[0] >= (1 << 20):
            return pallas_gram(terms, x0_local, x1_local) * scale
        return _eval_terms(scale, terms, x0_local, x1_local)

    return assemble(x0, x1)
