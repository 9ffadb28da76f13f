from . import predict  # noqa: F401
