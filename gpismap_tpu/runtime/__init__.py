from .index import SpatialIndex  # noqa: F401
