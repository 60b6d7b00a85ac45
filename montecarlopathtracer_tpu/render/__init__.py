from .integrator import TraceConfig, trace_radiance, render_sample_batch
from .film import Film, film_update, tonemap_linear, tonemap_gamma
from .renderer import Renderer, RenderSettings
from .regen import render_regen_batch

__all__ = [
    "render_regen_batch",
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
