from . import obsgp  # noqa: F401
