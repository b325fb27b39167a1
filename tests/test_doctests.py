"""Executable docstring examples on the top user-facing APIs.

The reference runs ``--doctest-modules`` over its whole ``src/`` tree
(``/root/reference/pyproject.toml``, ``[tool.pytest.ini_options]``);
here the same posture is applied to the curated public-surface modules
(each MUST carry at least one example — ``attempted > 0`` is asserted).
"""

import doctest
import importlib

import pytest

MODULES = [
    "linpde_gp_tpu.models.gp",
    "linpde_gp_tpu.models.iterative",
    "linpde_gp_tpu.models.domains.domain",
    "linpde_gp_tpu.models.randvars",
    "linpde_gp_tpu.ops.kernels.stationary",
    "linpde_gp_tpu.ops.kernels.tensor_product",
    "linpde_gp_tpu.ops.diffops.lindiffop",
    "linpde_gp_tpu.ops.transforms.dispatch",
    "linpde_gp_tpu.ops.functionals.integrals",
    "linpde_gp_tpu.ops.linalg.pcg",
]


@pytest.mark.parametrize("mod", MODULES)
def test_doctests(mod):
    result = doctest.testmod(
        importlib.import_module(mod),
        optionflags=doctest.NORMALIZE_WHITESPACE,
    )
    assert result.failed == 0, f"{result.failed} doctest failure(s) in {mod}"
    assert result.attempted > 0, f"no doctest examples found in {mod}"
