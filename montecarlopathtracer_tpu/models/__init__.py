from . import cornell

__all__ = ["cornell"]
