from . import functional, transforms  # noqa: F401
