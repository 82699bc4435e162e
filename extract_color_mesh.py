"""Extract a colored mesh from a trained model (reference
``extract_color_mesh.py`` CLI parity)."""
from nerf_pl_tpu.tools.extract_mesh import get_opts, run

if __name__ == "__main__":
    run(get_opts())
