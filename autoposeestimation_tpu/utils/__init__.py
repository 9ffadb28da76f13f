from . import transforms, io, timing  # noqa: F401
