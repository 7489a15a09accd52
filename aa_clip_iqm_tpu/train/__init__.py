from . import checkpoint, driver, optim, steps  # noqa: F401
