from . import adapters, clip, convert, iqm  # noqa: F401
