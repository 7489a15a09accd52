from . import scoring  # noqa: F401
