from .mesh import make_mesh, RAYS_AXIS, SPP_AXIS
from .sharded import (
    sharded_sample_pass,
    make_progressive_step,
    make_train_step,
    film_sharding,
)

__all__ = [
    "make_mesh",
    "RAYS_AXIS",
    "SPP_AXIS",
    "sharded_sample_pass",
    "make_progressive_step",
    "make_train_step",
    "film_sharding",
]
