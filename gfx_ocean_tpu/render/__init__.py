from .camera import Camera, InputState, look_at, perspective
from .mesh import build_grid
from .raster import (make_batch_renderer, make_frame_renderer, render_frame,
                     render_frames)
from .shade import shade_fragments

__all__ = [
    "Camera",
    "InputState",
    "build_grid",
    "look_at",
    "make_batch_renderer",
    "make_frame_renderer",
    "perspective",
    "render_frame",
    "render_frames",
    "shade_fragments",
]
