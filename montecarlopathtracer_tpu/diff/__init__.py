from .grad import (
    PARAM_FIELDS,
    split_params,
    merge_params,
    render_image,
    make_loss_fn,
    make_sgd_step,
)

__all__ = [
    "PARAM_FIELDS",
    "split_params",
    "merge_params",
    "render_image",
    "make_loss_fn",
    "make_sgd_step",
]
