from .sharding import make_mesh, make_sharded_rollout, make_sharded_step, shard_state
from .distributed_fft import ifft2_planes_unnorm_sharded, ifft2_real_unnorm_sharded

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


def __getattr__(name):
    # The band renderers pull in the whole render stack (raster/shade/
    # camera); sim-only mesh users (simulate/bench --mesh) shouldn't pay
    # that import — load .render lazily, mirroring the repo's inline-
    # import convention elsewhere.
    if name in ("make_sharded_batch_renderer", "make_sharded_frame_renderer"):
        from . import render

        return getattr(render, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
