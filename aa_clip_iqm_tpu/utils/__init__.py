from .misc import setup_logger, setup_seed  # noqa: F401
