from . import mesh, multihost  # noqa: F401
