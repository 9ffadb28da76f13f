from . import get_data  # noqa: F401
