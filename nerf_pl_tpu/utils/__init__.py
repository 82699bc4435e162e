from .visualization import visualize_depth

__all__ = ["visualize_depth"]
