"""Shape utilities (replaces ``pn.utils.as_shape`` from the reference's
probnum layer, see SURVEY.md L1)."""

from __future__ import annotations

import numbers
from typing import Iterable, Tuple

ShapeType = Tuple[int, ...]


def as_shape(x, ndim: int | None = None) -> ShapeType:
    """Coerce ``x`` into a shape tuple.

    Mirrors the behavior of ``probnum.utils.as_shape`` consumed throughout
    the reference (e.g. ``domains/_interval.py:74``).
    """
    if isinstance(x, numbers.Integral):
        shape = (int(x),)
    elif isinstance(x, Iterable):
        shape = tuple(int(s) for s in x)
    else:
        raise TypeError(f"Cannot interpret {x!r} as a shape.")

    if ndim is not None and len(shape) != ndim:
        if len(shape) == 1 and ndim > 1:
            shape = shape * ndim
        elif len(shape) != ndim:
            raise ValueError(f"Shape {shape} does not have ndim {ndim}.")

    return shape


def size(shape: ShapeType) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out
