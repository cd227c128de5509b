from .sharding import make_mesh, make_sharded_rollout, make_sharded_step, shard_state
from .distributed_fft import ifft2_planes_unnorm_sharded, ifft2_real_unnorm_sharded
from .render import make_sharded_batch_renderer, make_sharded_frame_renderer

__all__ = [
    "ifft2_planes_unnorm_sharded",
    "ifft2_real_unnorm_sharded",
    "make_mesh",
    "make_sharded_batch_renderer",
    "make_sharded_frame_renderer",
    "make_sharded_rollout",
    "make_sharded_step",
    "shard_state",
]
