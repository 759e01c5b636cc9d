from . import textfns  # noqa: F401

__all__ = ["textfns"]
