"""Plotting layer smoke tests (reference: ``utils/plotting.py``)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import linpde_gp_tpu as lgt
import linpde_gp_tpu.utils.plotting as lplt


@pytest.fixture
def posterior():
    prior = lgt.GaussianProcess(
        lgt.functions.Zero(()),
        2.0**2 * lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
    )
    X = np.asarray([-0.6, 0.0, 0.8])
    return prior.condition_on_observations(np.sin(X), X=X)


def test_plot_methods_attached(posterior):
    fig, ax = plt.subplots()
    grid = np.linspace(-1, 1, 30)
    posterior.plot(ax, grid, num_samples=3, rng=np.random.default_rng(0))
    posterior.mean.plot(ax, grid)
    lgt.functions.Polynomial((1.0, 2.0)).plot(ax, grid)
    assert len(ax.lines) >= 3
    plt.close(fig)


def test_plot_local_curvature():
    fig, ax = plt.subplots()
    lplt.plot_local_curvature(
        ax,
        xs=np.asarray([0.0, 0.5]),
        f_xs=np.asarray([1.0, 1.2]),
        ddf_xs=np.asarray([-2.0, -2.0]),
        label="obs",
    )
    assert len(ax.lines) == 2
    plt.close(fig)


def test_plot_gaussian_pdf():
    fig, ax = plt.subplots()
    rv = lgt.Normal(np.asarray(1.0), np.asarray([[0.25]]))
    lplt.plot_gaussian_pdf(rv, ax)
    assert len(ax.lines) == 1
    plt.close(fig)


def test_pdf_writer(tmp_path):
    writer = lplt.PDFWriter()
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    writer.setup(fig, str(tmp_path / "frame_{}.pdf"))
    writer.grab_frame()
    writer.grab_frame()
    writer.finish()
    assert (tmp_path / "frame_0.pdf").exists()
    assert (tmp_path / "frame_1.pdf").exists()
    plt.close(fig)


def test_plot_random_process_2d_surface_and_contour():
    """2-D posterior plotting (reference utils/plotting.py:72-185):
    mean surface + credible surfaces on a 3-D axis, contours on 2-D."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import linpde_gp_tpu as lgt
    import linpde_gp_tpu.utils.plotting  # noqa: F401 — attaches .plot

    k = lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=1.0),
        lgt.kernels.Matern((), nu=2.5, lengthscales=1.0),
    )
    prior = lgt.GaussianProcess(lgt.functions.Zero((2,)), k)
    X = np.random.default_rng(0).uniform(-1, 1, (12, 2))
    Y = np.sin(X[:, 0]) * X[:, 1]
    post = prior.condition_on_observations(Y, X=X)

    xs = (np.linspace(-1, 1, 9), np.linspace(-1, 1, 8))
    fig = plt.figure()
    ax3 = fig.add_subplot(1, 2, 1, projection="3d")
    surf = post.plot(ax3, xs, cred_int=0.95)
    assert surf is not None
    ax2 = fig.add_subplot(1, 2, 2)
    cs = post.plot(ax2, xs)
    assert cs is not None
    plt.close(fig)
