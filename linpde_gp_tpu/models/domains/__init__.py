"""Computation domains (reference: ``linpde_gp.domains``).

``Domain`` ABC with ``shape``/``volume``/``boundary``; ``Interval``,
``Point``, ``CartesianProduct``, ``Box``; ``asdomain`` coercion; and
``uniform_grid`` producing ``TensorProductGrid``s whose factor structure
unlocks Kronecker Gram assembly (reference: ``domains/_interval.py:74``,
``domains/_box.py:82-113``, ``covfuncs/_tensor_product.py:133``).
"""

from .domain import Domain, Point, Interval, CartesianProduct, Box, asdomain
from .grid import TensorProductGrid

__all__ = [
    "Domain",
    "Point",
    "Interval",
    "CartesianProduct",
    "Box",
    "asdomain",
    "TensorProductGrid",
]
