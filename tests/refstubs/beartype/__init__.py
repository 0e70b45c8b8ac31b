"""No-op beartype decorator (see README.md)."""


def beartype(func=None, **kwargs):
    if func is None:
        return lambda f: f
    return func
