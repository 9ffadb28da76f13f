from . import (  # noqa: F401
    projection,
    morphology,
    cca,
)
