from .embedding import Embedding, posenc
from .nerf import NeRFParams, init_nerf, nerf_apply
from .camera import Camera

__all__ = [
    "Embedding",
    "posenc",
    "NeRFParams",
    "init_nerf",
    "nerf_apply",
    "Camera",
]
