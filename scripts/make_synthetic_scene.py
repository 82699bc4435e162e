"""Generate a geometrically consistent synthetic test scene (see
``nerf_pl_tpu.data.synthetic``).

Usage:
    python scripts/make_synthetic_scene.py --out /tmp/sphere_scene \
        --img_wh 64 --n_train 20 --n_val 2 --n_test 2
"""
import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from nerf_pl_tpu.data.synthetic import generate_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--img_wh", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=20)
    ap.add_argument("--n_val", type=int, default=2)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--radius", type=float, default=4.5)
    ap.add_argument("--camera_angle_x", type=float, default=0.8)
    ap.add_argument("--format", choices=["blender", "llff", "pyredner"],
                    default="blender",
                    help="llff: images/ + poses_bounds.npy forward-facing fan")
    ap.add_argument("--img_h", type=int, default=None,
                    help="llff only: image height (default 3/4 of --img_wh)")
    ap.add_argument("--spheric", action="store_true",
                    help="llff only: inward-facing 360 ring (train with "
                    "--spheric_poses)")
    args = ap.parse_args()
    if args.format == "llff":
        from nerf_pl_tpu.data.synthetic import generate_llff_scene

        h = args.img_h or (args.img_wh * 3 // 4)
        generate_llff_scene(args.out, (args.img_wh, h), args.n_train,
                            args.radius, args.camera_angle_x,
                            spheric=args.spheric)
        kind = "llff-spheric" if args.spheric else "llff"
        print(f"wrote {args.out} ({kind}, {args.n_train} views @ "
              f"{args.img_wh}x{h})")
        return
    if args.format == "pyredner":
        from nerf_pl_tpu.data.synthetic import generate_pyredner_scene

        generate_pyredner_scene(args.out, args.img_wh, args.n_train,
                                args.n_val, args.n_test, args.radius,
                                args.camera_angle_x)
        print(f"wrote {args.out} (pyredner, {args.n_train}+{args.n_val}+"
              f"{args.n_test} views @ {args.img_wh}x{args.img_wh})")
        return
    generate_scene(args.out, args.img_wh, args.n_train, args.n_val,
                   args.n_test, args.radius, args.camera_angle_x)
    print(f"wrote {args.out} ({args.n_train}+{args.n_val}+{args.n_test} "
          f"views @ {args.img_wh}x{args.img_wh})")


if __name__ == "__main__":
    main()
