from . import dialect  # noqa: F401
