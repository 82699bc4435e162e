"""Whole-image rendering benchmark (the eval / serving path).

Times ``tools.render.render_image`` — fixed-shape ``lax.map`` chunks over
the fused kernels, test-time semantics (sigma-only coarse + full fine pass,
reference ``models/rendering.py:237-241``) — at a given resolution on the
current backend, syncing by fetching a pixel to host (remote-tunneled
backends do not reliably sync via ``block_until_ready``).

Prints one JSON line per resolution:
    {"metric": "render_rays_per_s", "img_wh": N, "seconds": s, "value": r}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_wh", nargs="+", type=int, default=[400])
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=32 * 1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--channel_io", type=lambda v: v.lower() == "true",
                    default=True,  # the production default; false = A/B
                    help="channel-major (8, P) ray IO at the fused-"
                         "kernel boundary (ops/fused_mlp.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_params
    from nerf_pl_tpu.ops.ray_utils import get_ray_directions, get_rays
    from nerf_pl_tpu.tools.render import render_image

    params = _flagship_params(jax.random.PRNGKey(0))
    for wh in args.img_wh:
        focal = 0.5 * wh / np.tan(0.4)
        dirs = get_ray_directions(wh, wh, focal)
        c2w = np.eye(3, 4, dtype=np.float32)
        c2w[:, 3] = [0.0, 0.0, 4.0]
        o, d = get_rays(dirs, c2w)
        nf = np.ones((o.shape[0], 1), np.float32)
        rays = jnp.asarray(
            np.concatenate([o, d, 2.0 * nf, 6.0 * nf], 1)
        )
        rkw = dict(
            N_samples=args.N_samples, N_importance=args.N_importance,
            perturb=0.0, noise_std=0.0, white_back=True, test_time=True,
            use_fused=jax.default_backend() == "tpu",
            fused_channel_io=args.channel_io,
        )

        def once(i):
            out = render_image(
                params, rays, jax.random.PRNGKey(i), chunk=args.chunk, **rkw
            )
            return float(out["rgb_fine"][0, 0])  # host fetch = real sync

        once(0)  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            once(i + 1)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "metric": "render_rays_per_s",
                    "channel_io": args.channel_io,
                    "chunk": args.chunk,
                    "img_wh": wh,
                    "seconds": round(dt, 3),
                    "value": round(wh * wh / dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
