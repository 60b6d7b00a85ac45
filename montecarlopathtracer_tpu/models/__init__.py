from . import cornell
from . import glossy

__all__ = ["cornell", "glossy"]
