from .rng import stream_uniform
from .sampling import sample_hemi, sample_phong, sample_fresnel
from .intersect import Hit, triangle_transforms, intersect_brute

__all__ = [
    "stream_uniform",
    "sample_hemi",
    "sample_phong",
    "sample_fresnel",
    "Hit",
    "triangle_transforms",
    "intersect_brute",
]
