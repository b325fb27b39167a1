"""Publication figure styling + savefig bundle for the experiment scripts.

Replaces the reference's ``experiment_utils`` styling layer
(``/root/reference/experiments/experiment_utils/__init__.py:9-84``:
tueplots bundles, ``config.experiment_name`` + ``savefig``) without the
tueplots dependency: a deterministic rcParams bundle with the same
intent (serif fonts, constrained layout, golden-ratio single-column
sizing) and a ``savefig`` that writes PDF+PNG next to a per-experiment
results directory.

Usage (inside an experiment script):

    from figures import apply_style, savefig
    apply_style()
    ... matplotlib plotting ...
    savefig("posterior")          # -> results/<experiment>/posterior.{pdf,png}
"""

from __future__ import annotations

import os

_GOLDEN = (1.0 + 5.0**0.5) / 2.0

#: rcParams bundle in the spirit of ``tueplots.bundles.beamer_moml`` /
#: the reference's ICML-style defaults.
STYLE = {
    "figure.figsize": (3.25, 3.25 / _GOLDEN),
    "figure.constrained_layout.use": True,
    "figure.dpi": 150,
    "savefig.dpi": 300,
    "font.family": "serif",
    "font.size": 9,
    "axes.titlesize": 9,
    "axes.labelsize": 9,
    "legend.fontsize": 8,
    "legend.frameon": False,
    "xtick.labelsize": 8,
    "ytick.labelsize": 8,
    "axes.spines.top": False,
    "axes.spines.right": False,
    "lines.linewidth": 1.2,
    "grid.alpha": 0.25,
}

_experiment_name = None


def apply_style(experiment_name: str | None = None, **overrides):
    """Apply the rcParams bundle (no-op if matplotlib is unavailable)."""
    global _experiment_name
    if experiment_name is not None:
        _experiment_name = experiment_name
    try:
        import matplotlib

        matplotlib.rcParams.update({**STYLE, **overrides})
    except ImportError:
        pass


def results_dir(experiment_name: str | None = None) -> str:
    name = experiment_name or _experiment_name or "misc"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", name
    )
    os.makedirs(out, exist_ok=True)
    return out


def savefig(stem: str, fig=None, *, experiment_name: str | None = None,
            formats=("pdf", "png")):
    """Save the current (or given) figure under
    ``experiments/results/<experiment>/<stem>.<fmt>`` — the reference's
    ``experiment_utils.savefig`` contract."""
    try:
        import matplotlib.pyplot as plt
    except ImportError:
        return []
    fig = fig or plt.gcf()
    out = results_dir(experiment_name)
    paths = []
    for fmt in formats:
        path = os.path.join(out, f"{stem}.{fmt}")
        fig.savefig(path, format=fmt, bbox_inches="tight")
        paths.append(path)
    return paths
