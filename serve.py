"""Serve novel-view renders from a trained checkpoint over HTTP (see
``nerf_pl_tpu.tools.serve``)."""
from nerf_pl_tpu.tools.serve import main

if __name__ == "__main__":
    main()
