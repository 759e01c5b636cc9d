from . import events  # noqa: F401

__all__ = ["events"]
