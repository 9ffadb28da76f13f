from . import create_pointcloud  # noqa: F401
