"""Convert a reference (PyTorch-Lightning) ``.ckpt`` into this framework's
weights-only checkpoint so a reference-trained scene loads directly via
``--ckpt_path`` / the eval and mesh tools."""
from nerf_pl_tpu.tools.import_torch_ckpt import main

if __name__ == "__main__":
    main()
