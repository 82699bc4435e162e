from .ray_utils import get_ray_directions, get_rays, get_ndc_rays
from .searchsorted import searchsorted
from .sampling import stratified_z_vals, perturb_z_vals, sample_pdf
from .compositing import composite
from .rendering import render_rays

__all__ = [
    "get_ray_directions",
    "get_rays",
    "get_ndc_rays",
    "searchsorted",
    "stratified_z_vals",
    "perturb_z_vals",
    "sample_pdf",
    "composite",
    "render_rays",
]
