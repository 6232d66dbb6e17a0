from . import binary_ops  # noqa: F401
