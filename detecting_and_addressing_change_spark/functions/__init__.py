from . import text, arrays, hashing  # noqa: F401

__all__ = ["text", "arrays", "hashing"]
