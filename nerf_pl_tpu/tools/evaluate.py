"""Test-set evaluation: render every test pose, save PNGs (+ optional depth
PFM/bytes), write a GIF, report mean PSNR (reference ``eval.py``).

Reference behaviors kept: ``test_time=True`` rendering with perturb/noise
off (``eval.py:74-79``); depth ``nan_to_num`` before save (``eval.py:129``);
gif at 30 fps (``eval.py:145``); PSNR only for splits with GT.  Fixed (and
documented): the reference shadows its own ``--chunk`` flag with a
hardcoded 1024*32 (``eval.py:65``) — here the flag is honored.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset_dict
from ..models.nerf import init_nerf
from ..training.checkpoints import load_ckpt_into
from ..training.metrics import psnr as psnr_metric
from .render import render_image

# frames kept in flight by the pipelined eval loop (1 = fully serial);
# module-level so benchmarks/tests can override
EVAL_WINDOW = 3


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, default="blender",
                        choices=["blender", "llff"])
    parser.add_argument("--scene_name", type=str, default="test")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--img_wh", nargs="+", type=int, default=[800, 800])
    parser.add_argument("--spheric_poses", default=False, action="store_true")
    parser.add_argument("--N_samples", type=int, default=64)
    parser.add_argument("--N_importance", type=int, default=128)
    parser.add_argument("--use_disp", default=False, action="store_true")
    # reference value (eval.py:65). With the packed channel-major ray IO
    # (round 3) larger chunks compile too, but 32768 measures fastest —
    # keep the reference default
    parser.add_argument("--chunk", type=int, default=32 * 1024)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--save_depth", default=False, action="store_true")
    parser.add_argument("--depth_format", type=str, default="pfm",
                        choices=["pfm", "bytes"])
    parser.add_argument("--out_dir", type=str, default="results")
    # framework extensions (upstream 2/6 vs fork 1/200 bounds)
    parser.add_argument("--blender_near", type=float, default=2.0)
    parser.add_argument("--blender_far", type=float, default=6.0)
    parser.add_argument("--white_back", type=lambda s: s.lower() == "true",
                        default=None)
    parser.add_argument("--fused_channel_io",
                        type=lambda v: v.lower() == "true", default=True,
                        help="packed channel-major ray IO at the fused-"
                             "kernel boundary (production default; false "
                             "falls back to the row-major kernels)")
    parser.add_argument("--eval_window", type=int, default=None,
                        help="frames kept in flight by the pipelined eval "
                             "loop (default 3; 1 = fully serial)")
    return parser.parse_args(argv)


def load_models(ckpt_path: str):
    """Coarse(+fine) params from a checkpoint. A checkpoint trained with
    N_importance=0 has no fine weights — then "fine" is OMITTED rather
    than silently substituting a randomly initialized network (which would
    render garbage with no error)."""
    from ..training.checkpoints import extract_model_state_dict

    def width_of(state: dict) -> int:
        # --arch_width checkpoints carry their width in the weight shapes
        # (trunk layer 0 is (in_xyz, W)); default 256 when absent so a
        # coarse-only/partial artifact still errors on the merge assert
        # rather than here
        w = state.get("xyz_layers/0/w")
        return int(w.shape[1]) if w is not None else 256

    coarse_sd = extract_model_state_dict(ckpt_path, "coarse")
    params = {
        "coarse": load_ckpt_into(
            init_nerf(jax.random.PRNGKey(0), W=width_of(coarse_sd)),
            ckpt_path, "coarse", loaded=coarse_sd,
        ),
    }
    fine_sd = extract_model_state_dict(ckpt_path, "fine")
    if fine_sd:
        params["fine"] = load_ckpt_into(
            init_nerf(jax.random.PRNGKey(1), W=width_of(fine_sd)),
            ckpt_path, "fine", loaded=fine_sd,
        )
    return params


def run(args) -> Optional[float]:
    import imageio.v2 as imageio

    w, h = args.img_wh
    kwargs = {
        "root_dir": args.root_dir,
        "split": args.split,
        "img_wh": tuple(args.img_wh),
    }
    if args.dataset_name == "llff":
        kwargs["spheric_poses"] = args.spheric_poses
    else:
        kwargs.update(near=args.blender_near, far=args.blender_far,
                      white_back=args.white_back)
    dataset = dataset_dict[args.dataset_name](**kwargs)

    params = load_models(args.ckpt_path)
    if "fine" not in params and args.N_importance > 0:
        print("[eval] checkpoint has no fine model — rendering coarse-only")
        args.N_importance = 0

    imgs, psnrs = [], []
    dir_name = os.path.join(args.out_dir, args.dataset_name, args.scene_name)
    os.makedirs(dir_name, exist_ok=True)

    rkw = dict(
        N_samples=args.N_samples,
        N_importance=args.N_importance,
        use_disp=args.use_disp,
        perturb=0.0,
        noise_std=0.0,
        white_back=dataset.white_back,
        test_time=True,
        use_fused=jax.default_backend() == "tpu",
        fused_channel_io=getattr(args, "fused_channel_io", True),
    )
    # pipelined frame loop: renders dispatch asynchronously, so keeping a
    # small in-flight window overlaps frame i's device render with frame
    # i-1's host fetch, PNG/PFM writes, PSNR, and frame i+1's dataset IO
    # (per-dispatch latency is ~0.5 s through a remote-tunneled backend —
    # serializing it against host work doubles eval wall-clock on long
    # test splits).  Frames are processed strictly in order.
    from collections import deque

    def submit(i):
        sample = dataset[i]
        rays = jnp.asarray(sample["rays"])
        results = render_image(
            params, rays, jax.random.PRNGKey(i), chunk=args.chunk, **rkw
        )
        return i, sample, results

    def process(i, sample, results):
        typ = "fine" if "rgb_fine" in results else "coarse"
        img_pred = np.asarray(results[f"rgb_{typ}"]).reshape(h, w, 3)

        if args.save_depth:
            depth_pred = np.nan_to_num(
                np.asarray(results[f"depth_{typ}"]).reshape(h, w)
            )
            if args.depth_format == "pfm":
                from ..data.depth_utils import save_pfm

                save_pfm(
                    os.path.join(dir_name, f"depth_{i:03d}.pfm"), depth_pred
                )
            else:
                with open(os.path.join(dir_name, f"depth_{i:03d}"), "wb") as f:
                    f.write(depth_pred.tobytes())

        img8 = (np.clip(img_pred, 0, 1) * 255).astype(np.uint8)
        imgs.append(img8)
        imageio.imwrite(os.path.join(dir_name, f"{i:03d}.png"), img8)

        if "rgbs" in sample:
            gt = np.asarray(sample["rgbs"]).reshape(h, w, 3)
            psnrs.append(
                float(psnr_metric(jnp.asarray(gt), jnp.asarray(img_pred)))
            )

    window = getattr(args, "eval_window", None)
    if window is None:  # 0/negative mean serial via max(1, .), not "unset"
        window = EVAL_WINDOW
    inflight = deque()
    for i in range(len(dataset)):
        inflight.append(submit(i))
        if len(inflight) >= max(1, window):
            process(*inflight.popleft())
    while inflight:
        process(*inflight.popleft())

    imageio.mimsave(
        os.path.join(dir_name, f"{args.scene_name}.gif"), imgs, fps=30
    )
    if psnrs:
        mean_psnr = float(np.mean(psnrs))
        print(f"Mean PSNR : {mean_psnr:.2f}")
        return mean_psnr
    return None
