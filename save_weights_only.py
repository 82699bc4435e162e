"""Strip optimizer/trainer state from a checkpoint, keeping only the model
params — the ~5 MB "portable scene" artifact (reference
``utils/save_weights_only.py``; README.md:181-184)."""
import argparse
import os

from nerf_pl_tpu.training.checkpoints import load_checkpoint, save_checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, default=None)
    args = parser.parse_args()
    state = load_checkpoint(args.ckpt_path)
    if args.out_path:
        out = args.out_path
    else:
        # never collapse onto the input path (str.replace is a no-op when
        # the name lacks '.ckpt', which would overwrite the full checkpoint
        # and destroy its optimizer/epoch state)
        root, ext = os.path.splitext(args.ckpt_path)
        out = f"{root}_weights{ext or '.ckpt'}"
        assert out != args.ckpt_path
    save_checkpoint(out, {"params": state["params"]})
    print(f"weights-only checkpoint saved to {out}")


if __name__ == "__main__":
    main()
