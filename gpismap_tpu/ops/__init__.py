from . import gp, kernels  # noqa: F401
