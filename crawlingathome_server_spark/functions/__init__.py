from . import robots, text, urls  # noqa: F401
