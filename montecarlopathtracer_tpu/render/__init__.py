from .integrator import TraceConfig, trace_radiance, render_sample_batch
from .film import Film, film_update, tonemap_linear, tonemap_gamma
from .renderer import Renderer, RenderSettings

__all__ = [
    "TraceConfig",
    "trace_radiance",
    "render_sample_batch",
    "Film",
    "film_update",
    "tonemap_linear",
    "tonemap_gamma",
    "Renderer",
    "RenderSettings",
]
