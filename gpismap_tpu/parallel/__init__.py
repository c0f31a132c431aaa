from .mesh import data_mesh, dryrun_update_step, sharded_map_test  # noqa: F401
