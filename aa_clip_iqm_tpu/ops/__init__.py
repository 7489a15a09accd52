from . import attention, interp, layers, losses, metrics  # noqa: F401
