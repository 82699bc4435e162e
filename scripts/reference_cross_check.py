"""Cross-framework render check: a scene TRAINED by this framework is
rendered by the REFERENCE's own code.

Exports one of our checkpoints to a torch state_dict, loads it with the
reference's ``load_ckpt`` into the reference's ``NeRF`` modules, renders a
test view with the reference's ``models/rendering.py::render_rays`` (stock
torch on CPU, ``torchsearchsorted`` stubbed with ``torch.searchsorted``),
and reports PSNR vs ground truth alongside our own renderer's PSNR on the
same view — the end-to-end proof that a scene trained here is portable to
the reference ecosystem.

Usage:
    python scripts/reference_cross_check.py --ckpt_path ckpts/exp/epoch=N.ckpt \
        --root_dir <blender scene> --img_wh 64 64 --blender_near 1 \
        --blender_far 12 [--N_samples 64 --N_importance 128]
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--img_wh", nargs=2, type=int, default=[64, 64])
    ap.add_argument("--blender_near", type=float, default=2.0)
    ap.add_argument("--blender_far", type=float, default=6.0)
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=128)
    ap.add_argument("--white_back", type=lambda s: s.lower() == "true",
                    default=True)
    ap.add_argument("--frame", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch-vs-jax on one host

    import numpy as np
    import torch

    from reference_harness import load_reference

    from nerf_pl_tpu.data.blender import BlenderDataset
    from nerf_pl_tpu.tools.import_torch_ckpt import export_torch_checkpoint
    from nerf_pl_tpu.training.checkpoints import load_checkpoint
    from nerf_pl_tpu.training import metrics

    ref = load_reference()

    exported = "/tmp/reference_cross_check_export.ckpt"
    export_torch_checkpoint(args.ckpt_path, exported)
    state = load_checkpoint(args.ckpt_path)
    has_fine = "fine" in state.get("params", {})

    # derive the architecture from the exported state_dict so non-default
    # N_emb_xyz/N_emb_dir/D/W/skips checkpoints load correctly (advisor
    # round 2) — shapes, not flags, are the source of truth
    sd = torch.load(exported, map_location="cpu", weights_only=True)["state_dict"]
    pre = "nerf_coarse."
    D = sum(1 for k in sd if k.startswith(pre + "xyz_encoding_")
            and k.endswith(".0.weight") and "final" not in k)
    W = sd[pre + "sigma.weight"].shape[1]
    cx = sd[pre + "xyz_encoding_1.0.weight"].shape[1]
    cd = sd[pre + "dir_encoding.0.weight"].shape[1] - W
    skips = [i - 1 for i in range(2, D + 1)
             if sd[pre + f"xyz_encoding_{i}.0.weight"].shape[1] == W + cx]
    n_emb_xyz, n_emb_dir = (cx - 3) // 6, (cd - 3) // 6
    assert cx == 3 * (2 * n_emb_xyz + 1) and cd == 3 * (2 * n_emb_dir + 1), (
        f"non-positional-encoding channel counts xyz={cx} dir={cd}")

    models = []
    for name in (["nerf_coarse", "nerf_fine"] if has_fine else ["nerf_coarse"]):
        m = ref.nerf.NeRF(D=D, W=W, in_channels_xyz=cx, in_channels_dir=cd,
                          skips=skips)
        ref.utils.load_ckpt(m, exported, model_name=name)
        m.eval()
        models.append(m)
    embeddings = [ref.nerf.Embedding(3, n_emb_xyz), ref.nerf.Embedding(3, n_emb_dir)]

    ds = BlenderDataset(
        args.root_dir, "test", img_wh=tuple(args.img_wh),
        near=args.blender_near, far=args.blender_far,
        white_back=args.white_back,
    )
    sample = ds[args.frame]
    rays = torch.from_numpy(np.asarray(sample["rays"], np.float32))
    gt = np.asarray(sample["rgbs"], np.float32)

    with torch.no_grad():
        out = ref.rendering.render_rays(
            models, embeddings, rays, args.N_samples, False, 0.0, 0.0,
            args.N_importance, 32 * 1024, args.white_back, test_time=True,
        )
    key = "rgb_fine" if has_fine else "rgb_coarse"
    ref_img = out[key].numpy()
    ref_psnr = float(metrics.psnr(ref_img, gt))

    # our renderer on the same view, same params, deterministic
    import jax.numpy as jnp

    from nerf_pl_tpu.tools.render import render_image

    params = load_checkpoint(args.ckpt_path)["params"]

    def delist(t):
        if isinstance(t, dict) and t and all(k.isdigit() for k in t):
            return [delist(t[k]) for k in sorted(t, key=int)]
        if isinstance(t, dict):
            return {k: delist(v) for k, v in t.items()}
        return jnp.asarray(t)

    params = delist(params)
    ours = render_image(
        params, jnp.asarray(sample["rays"]), jax.random.PRNGKey(0),
        chunk=32 * 1024, N_samples=args.N_samples, use_disp=False,
        perturb=0.0, noise_std=0.0, N_importance=args.N_importance,
        white_back=args.white_back, mode="rgb", test_time=True,
        use_fused=False,
    )
    our_img = np.asarray(ours[key])
    our_psnr = float(metrics.psnr(our_img, gt))

    print(f"reference-render PSNR: {ref_psnr:.2f}")
    print(f"our-render PSNR:       {our_psnr:.2f}")
    print(f"cross-image max|diff|: {np.abs(ref_img - our_img).max():.4f}")


if __name__ == "__main__":
    main()
