"""Posterior checkpoint/resume.

SURVEY.md §5: the reference has no checkpointing; its nearest analog is
the immutable ``ConditionalGaussianProcess`` accumulation state.  Here
that state — ``(prior-spec, Ls, residuals, Cholesky factor, weights)`` —
is explicitly serializable: the numeric state is a pytree of arrays, and
the symbolic objects (kernels, functionals, operators) are plain Python
object graphs with numpy leaves, so a pickle with device arrays converted
to host numpy round-trips exactly.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(obj):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x, obj
    )


class _HostArrayPickler(pickle.Pickler):
    def persistent_id(self, obj):
        return None

    def reducer_override(self, obj):
        if isinstance(obj, jnp.ndarray):
            return (jnp.asarray, (np.asarray(obj),))
        return NotImplemented


def save_posterior(path, posterior) -> None:
    """Serialize a (conditional) GP to ``path``."""
    with open(path, "wb") as fh:
        _HostArrayPickler(fh, protocol=pickle.HIGHEST_PROTOCOL).dump(posterior)


def load_posterior(path):
    """Restore a GP saved by :func:`save_posterior`."""
    with open(path, "rb") as fh:
        return pickle.load(fh)
