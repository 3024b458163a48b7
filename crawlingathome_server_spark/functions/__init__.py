from . import text, urls  # noqa: F401
