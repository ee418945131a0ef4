from .mesh import (
    make_mesh,
    render_frame_sharded,
    train_step_sharded,
    shard_rays,
)
from . import distributed

__all__ = [
    "make_mesh",
    "render_frame_sharded",
    "train_step_sharded",
    "shard_rays",
    "distributed",
]
