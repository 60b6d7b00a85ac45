from .image import save_png, load_png
from .logging import RenderLog

__all__ = ["save_png", "load_png", "RenderLog"]
