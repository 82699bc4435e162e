"""Inspect a shadow dataset + camera geometry — the script equivalent of the
reference's ``shadows.ipynb`` (dataset/Camera sanity checks by hand).

Prints the light rig, per-frame PPCs, buffer shapes, and verifies the
geometric consistency of the camera→light projection on real scene data
(a world point on a camera ray must land at its true light-space pixel).

Usage:
    python examples/inspect_shadow_scene.py --root_dir <scene> --img_wh 64 64
"""
import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--dataset_name", default="efficient_sm",
                    choices=["efficient_sm", "rgb_sm", "shadows", "pyredner2"])
    ap.add_argument("--img_wh", nargs="+", type=int, default=[64, 64])
    args = ap.parse_args()

    from nerf_pl_tpu.data import dataset_dict

    ds = dataset_dict[args.dataset_name](
        args.root_dir, "train", img_wh=tuple(args.img_wh)
    )
    light = ds.light
    print("=== light rig ===")
    print("eye:", light.eye_pos)
    print("M:\n", light.camera)
    print("rays:", light.rays.shape, "near/far:",
          light.rays[0, 6], light.rays[0, 7])
    if hasattr(ds, "all_rays"):
        print("=== train buffers ===")
        print("rays:", ds.all_rays.shape, "targets:", ds.all_rgbs.shape)
        if hasattr(ds, "cam_ms"):
            print("poses:", ds.cam_ms.shape[0])
            for i in range(min(3, ds.cam_ms.shape[0])):
                print(f"  pose {i}: eye={ds.cam_eyes[i]}")

    # geometric consistency on real scene data
    if hasattr(ds, "cam_ms"):
        import jax.numpy as jnp

        from nerf_pl_tpu.ops.shadow_mapping import get_projections

        M, eye = ds.cam_ms[0], ds.cam_eyes[0]
        w, h = args.img_wh
        pix = np.array([[w / 2 + 0.5, h / 2 + 0.5, 1.0]], np.float32)
        t = np.array([3.0], np.float32)
        P = eye + t[0] * (M @ pix[0])
        pd = np.concatenate([pix, np.linalg.norm(t[0] * (M @ pix[0]))
                             [None, None].astype(np.float32)], 1)
        K = np.asarray(
            get_projections(
                jnp.asarray(M), jnp.asarray(eye), jnp.asarray(light.camera),
                jnp.asarray(light.eye_pos), jnp.asarray(pd),
            )
        )
        ml_inv = np.linalg.inv(light.camera)
        want = ml_inv @ (P - light.eye_pos)
        print("=== projection consistency (center pixel, t=3) ===")
        print("projected (ul, vl, wl):", K[0])
        print("expected  (u/w, v/w, w):",
              want[0] / want[2], want[1] / want[2], want[2])
        ok = np.allclose(K[0], [want[0] / want[2], want[1] / want[2], want[2]],
                         rtol=1e-3)
        print("consistent:", bool(ok))


if __name__ == "__main__":
    main()
