"""Compute-path layers: kernels, operators, functionals, linalg, transforms."""

from . import crosscov, diffops, functionals, kernels, linalg, transforms

__all__ = ["crosscov", "diffops", "functionals", "kernels", "linalg", "transforms"]
