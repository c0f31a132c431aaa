from .mesh import data_mesh, sharded_map_test  # noqa: F401
