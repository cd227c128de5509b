from .camera import Camera, InputState, look_at, perspective
from .mesh import build_grid
from .raster import render_frame, render_frames
from .shade import shade_fragments

__all__ = [
    "Camera",
    "InputState",
    "build_grid",
    "look_at",
    "perspective",
    "render_frame",
    "render_frames",
    "shade_fragments",
]
