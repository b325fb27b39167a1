from . import shapes

__all__ = ["shapes", "plotting"]


def __getattr__(name):
    # matplotlib is optional; load the plotting module lazily.
    if name == "plotting":
        from . import plotting

        return plotting
    raise AttributeError(name)
