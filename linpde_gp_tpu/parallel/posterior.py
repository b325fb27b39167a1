"""Sharded posterior evaluation: query points split over every device
(embarrassingly parallel — reference equivalent is the batched
``_evaluate`` paths of SURVEY.md §2.10)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_posterior_eval(posterior, X, *, mesh: Mesh, with_std: bool = False):
    """Evaluate posterior mean (and optionally std) with ``X`` sharded
    over all mesh devices.

    Pads the query batch to a multiple of the device count, annotates the
    sharding, and lets GSPMD partition the pairwise kernel evaluation —
    the Gram factor stays replicated, queries never communicate.
    """
    X = jnp.asarray(X)
    in_ndim = len(posterior.input_shape)
    batch_shape = X.shape[: X.ndim - in_ndim]
    n = 1
    for s in batch_shape:
        n *= s
    x_flat = X.reshape((n,) + posterior.input_shape)
    num_devices = mesh.devices.size
    pad = (-n) % num_devices
    if pad:
        x_flat = jnp.concatenate(
            [x_flat, jnp.broadcast_to(x_flat[:1], (pad,) + x_flat.shape[1:])]
        )
    sharding = NamedSharding(mesh, P(mesh.axis_names))
    x_flat = jax.device_put(x_flat, sharding)

    @jax.jit
    def run(xq):
        mean = posterior.mean(xq)
        if with_std:
            return mean, posterior.std(xq)
        return mean

    out = run(x_flat)
    if with_std:
        mean, std = out
        return (
            mean[:n].reshape(batch_shape + posterior.output_shape),
            std[:n].reshape(batch_shape + posterior.output_shape),
        )
    return out[:n].reshape(batch_shape + posterior.output_shape)
