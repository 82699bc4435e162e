"""Render the test set of a trained model: per-frame PNGs, optional depth
maps, a GIF, and mean PSNR (reference ``eval.py`` CLI parity)."""
from nerf_pl_tpu.tools.evaluate import get_opts, run

if __name__ == "__main__":
    run(get_opts())
