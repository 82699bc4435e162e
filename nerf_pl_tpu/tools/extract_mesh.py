"""Colored-mesh extraction (reference ``extract_color_mesh.py``).

Pipeline (call stack parity, SURVEY.md §3.4):
  1. dense N³ sigma query of the fine NeRF with zero view dirs (on device,
     chunked; ``extract_color_mesh.py:114-137``);
  2. iso-surface triangulation at ``sigma_threshold`` (CPU,
     marching-tetrahedra variant — see ``mesh_utils``) with the reference's
    x/y swap back into world range (``extract_color_mesh.py:148-155``);
  3. largest-connected-cluster denoise (``:164-171``);
  4. color fusion: project vertices into every training image, bilinear
     color lookup, occlusion test via NeRF opacity along camera→vertex rays
     with far = vertex depth, inverse-depth-weighted averaging
     (``:211-277``); or the vertex-normal variant (``--use_vertex_normal``,
     ``:187-204``) where normals come from the DENSITY GRADIENT (central
     differences on the sigma grid) rather than winding-dependent face
     normals;
  5. write the colored binary PLY (``:279-297``).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data import dataset_dict
from ..models.embedding import posenc
from ..models.nerf import nerf_apply
from ..ops.rendering import render_rays
from .evaluate import load_models
from .mesh_utils import (
    bilinear_sample,
    keep_largest_cluster,
    marching_tetrahedra,
    save_vol,
    write_ply,
)


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, default="blender",
                        choices=["blender", "llff"])
    parser.add_argument("--scene_name", type=str, default="test")
    parser.add_argument("--img_wh", nargs="+", type=int, default=[800, 800])
    parser.add_argument("--N_samples", type=int, default=64)
    parser.add_argument("--chunk", type=int, default=32 * 1024)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--N_grid", type=int, default=256)
    parser.add_argument("--x_range", nargs="+", type=float, default=[-1.0, 1.0])
    parser.add_argument("--y_range", nargs="+", type=float, default=[-1.0, 1.0])
    parser.add_argument("--z_range", nargs="+", type=float, default=[-1.0, 1.0])
    parser.add_argument("--sigma_threshold", type=float, default=20.0)
    parser.add_argument("--occ_threshold", type=float, default=0.2)
    parser.add_argument("--use_vertex_normal", action="store_true")
    parser.add_argument("--N_importance", type=int, default=64)
    parser.add_argument("--near_t", type=float, default=1.0)
    parser.add_argument("--out_path", type=str, default=None)
    parser.add_argument("--blender_near", type=float, default=2.0)
    parser.add_argument("--blender_far", type=float, default=6.0)
    parser.add_argument("--vol_path", type=str, default=None,
                        help="also write the sigma grid as a .vol volume "
                        "texture (Unity VolumeRender parity, "
                        "reference README_Unity.md:22-28)")
    parser.add_argument("--vol_only", action="store_true",
                        help="stop after writing --vol_path (no mesh)")
    return parser.parse_args(argv)


def query_sigma_grid(params_fine, xyz: np.ndarray, chunk: int) -> np.ndarray:
    """sigma for (M, 3) points, chunked through the jitted MLP."""

    @jax.jit
    def f(p, x):
        emb = jnp.concatenate(
            [posenc(x, 10), posenc(jnp.zeros_like(x), 4)], axis=-1
        )
        return nerf_apply(p, emb)[:, 3]

    out = []
    m = xyz.shape[0]
    pad = (-m) % chunk
    xyz_p = np.concatenate([xyz, np.zeros((pad, 3), xyz.dtype)], 0)
    for i in range(0, len(xyz_p), chunk):
        out.append(np.asarray(f(params_fine, jnp.asarray(xyz_p[i : i + chunk]))))
    return np.concatenate(out)[:m]


def grid_vertices_to_world(vertices, N, x_range, y_range, z_range):
    """Grid-index verts -> world.

    The sigma grid comes from ``np.meshgrid(x, y, z)`` with the default
    'xy' indexing, so grid axis 0 indexes y and axis 1 indexes x. The
    reference performs this same axis swap (``extract_color_mesh.py:148-155``)
    but applies the wrong range offsets when ``x_range != y_range`` (its
    equal-range assert is commented out, ``extract_color_mesh.py:118``) —
    documented fix per SURVEY §7: axis 1 maps through x_range and axis 0
    through y_range, verified against an analytic-sphere oracle
    (``tests/test_mesh_utils.py``, ``scripts/validate_mesh.py``).
    """
    xmin, xmax = x_range
    ymin, ymax = y_range
    zmin, zmax = z_range
    v = vertices / N
    out = np.empty_like(v)
    out[:, 0] = (xmax - xmin) * v[:, 1] + xmin  # grid axis 1 -> world x
    out[:, 1] = (ymax - ymin) * v[:, 0] + ymin  # grid axis 0 -> world y
    out[:, 2] = (zmax - zmin) * v[:, 2] + zmin
    return out.astype(np.float32)


def _chunked_render(params, rays: np.ndarray, chunk: int, n_samples: int,
                    n_importance: int, white_back: bool):
    @jax.jit
    def f(p, r):
        return render_rays(
            p.get("coarse"), p.get("fine"), r, None, N_samples=n_samples,
            N_importance=n_importance, perturb=0.0, noise_std=0.0,
            white_back=white_back, test_time=True,
            use_fused=jax.default_backend() == "tpu",
        )

    outs = {}
    m = rays.shape[0]
    pad = (-m) % chunk
    rays_p = np.concatenate([rays, np.repeat(rays[-1:], pad, 0)], 0)
    for i in range(0, len(rays_p), chunk):
        r = f(params, jnp.asarray(rays_p[i : i + chunk]))
        for k, v in r.items():
            outs.setdefault(k, []).append(np.asarray(v))
    return {k: np.concatenate(v)[:m] for k, v in outs.items()}


def run(args) -> str:
    from PIL import Image

    kwargs = {"root_dir": args.root_dir, "img_wh": tuple(args.img_wh)}
    if args.dataset_name == "llff":
        kwargs["spheric_poses"] = True
        kwargs["split"] = "test"
    else:
        kwargs["split"] = "train"
        kwargs.update(near=args.blender_near, far=args.blender_far)
    dataset = dataset_dict[args.dataset_name](**kwargs)
    params = load_models(args.ckpt_path)

    # 1. dense sigma grid (meshgrid ij over x, y, z like the reference's
    #    np.meshgrid(x, y, z) default 'xy' → the x/y swap below undoes it)
    N = args.N_grid
    x = np.linspace(*args.x_range, N)
    y = np.linspace(*args.y_range, N)
    z = np.linspace(*args.z_range, N)
    xyz = np.stack(np.meshgrid(x, y, z), -1).reshape(-1, 3).astype(np.float32)
    print("Predicting occupancy ...")
    sigma = query_sigma_grid(params["fine"], xyz, args.chunk)
    sigma_grid = np.maximum(sigma, 0).reshape(N, N, N)

    if args.vol_path:
        # meshgrid 'xy' gives (y, x, z) axes; store the .vol x-major
        save_vol(args.vol_path, sigma_grid.transpose(1, 0, 2),
                 args.x_range, args.y_range, args.z_range)
        print(f"Wrote volume texture to {args.vol_path}")
        if args.vol_only:
            return args.vol_path

    # 2. iso-surface
    print("Extracting mesh ...")
    vertices, triangles = marching_tetrahedra(sigma_grid, args.sigma_threshold)
    vertices_w = grid_vertices_to_world(
        vertices, N, args.x_range, args.y_range, args.z_range
    )

    if len(triangles) == 0:
        out_path = args.out_path or f"{args.scene_name}.ply"
        write_ply(out_path, vertices_w, triangles)
        print("No surface crossed sigma_threshold — wrote empty mesh.")
        return out_path

    # 3. denoise
    print("Removing noise ...")
    vertices_w, triangles = keep_largest_cluster(vertices_w, triangles)
    print(
        f"Mesh has {len(vertices_w)/1e6:.2f} M vertices and "
        f"{len(triangles)/1e6:.2f} M faces."
    )

    W, H = args.img_wh
    K = np.array(
        [[dataset.focal, 0, W / 2], [0, dataset.focal, H / 2], [0, 0, 1]],
        dtype=np.float32,
    )
    n_vert = len(vertices_w)
    vertices_homo = np.concatenate([vertices_w, np.ones((n_vert, 1))], 1)

    if args.use_vertex_normal:
        # normals from the density gradient at each vertex (robust to
        # triangle winding, unlike face-normal averaging)
        # sigma_grid from meshgrid(x,y,z,'xy') has axes (y, x, z); gradients
        # come back per-axis as (d/dy, d/dx, d/dz)
        g_y, g_x, g_z = np.gradient(sigma_grid)
        # exact inverse of grid_vertices_to_world: grid axis 0 indexes
        # world Y (y_range), grid axis 1 indexes world X (x_range)
        i0 = (vertices_w[:, 1] - args.y_range[0]) / (
            args.y_range[1] - args.y_range[0]
        )
        i1 = (vertices_w[:, 0] - args.x_range[0]) / (
            args.x_range[1] - args.x_range[0]
        )
        i2 = (vertices_w[:, 2] - args.z_range[0]) / (
            args.z_range[1] - args.z_range[0]
        )
        idx = np.clip(
            np.round(np.stack([i0, i1, i2], 1) * N).astype(int), 0, N - 1
        )
        ii = (idx[:, 0], idx[:, 1], idx[:, 2])  # (y-axis, x-axis, z-axis)
        g = np.stack([g_x[ii], g_y[ii], g_z[ii]], axis=1)
        normals = -g / (np.linalg.norm(g, axis=1, keepdims=True) + 1e-8)
        near = dataset.bounds.min() * np.ones((n_vert, 1), np.float32)
        far = dataset.bounds.max() * np.ones((n_vert, 1), np.float32)
        rays_o = vertices_w - normals * near * args.near_t
        rays = np.concatenate(
            [rays_o, normals, near, far], 1
        ).astype(np.float32)
        results = _chunked_render(
            params, rays, args.chunk, args.N_samples, args.N_importance,
            dataset.white_back,
        )
        v_colors = np.clip(results["rgb_fine"], 0, 1) * 255.0
    else:
        non_occluded_sum = np.zeros((n_vert, 1))
        v_color_sum = np.zeros((n_vert, 3))
        print("Fusing colors ...")

        # opacity-only render kept on device so dispatches pipeline: the
        # remote-tunneled backend has ~0.5 s/call dispatch latency, so a
        # fetch-per-chunk loop is latency-bound (n_views * n_chunks round
        # trips); dispatching every view's chunks asynchronously and
        # fetching afterwards overlaps that latency with device compute
        @jax.jit
        def occ_fn(p, r):
            out = render_rays(
                p.get("coarse"), p.get("fine"), r, None,
                N_samples=args.N_samples, N_importance=0, perturb=0.0,
                noise_std=0.0, white_back=dataset.white_back,
                test_time=True, use_fused=jax.default_backend() == "tpu",
            )
            return out["opacity_coarse"]

        chunk = args.chunk
        pad = (-n_vert) % chunk
        pending = []  # (colors, depth, opacity device chunks) per view

        def drain_one():
            colors, depth, chunks = pending.pop(0)
            opacity = np.concatenate([np.asarray(c) for c in chunks])[:n_vert]
            opacity = np.nan_to_num(opacity[:, None], nan=1.0)
            non_occluded = np.ones_like(non_occluded_sum) * 0.1 / depth
            non_occluded += opacity < args.occ_threshold
            return colors * non_occluded, non_occluded

        for idx in range(len(dataset.image_paths)):
            image = Image.open(dataset.image_paths[idx]).convert("RGB")
            image = np.array(image.resize(tuple(args.img_wh), Image.LANCZOS))

            P_c2w = np.concatenate(
                [dataset.poses[idx], np.array([[0, 0, 0, 1]])], 0
            )
            P_w2c = np.linalg.inv(P_c2w)[:3]
            vertices_cam = P_w2c @ vertices_homo.T  # "right up back"
            vertices_cam[1:] *= -1  # -> "right down forward"
            vertices_image = (K @ vertices_cam).T
            depth = vertices_image[:, -1:] + 1e-5
            vertices_image = vertices_image[:, :2] / depth
            vx = np.clip(vertices_image[:, 0], 0, W - 1)
            vy = np.clip(vertices_image[:, 1], 0, H - 1)
            colors = bilinear_sample(image, vx, vy)

            rays_o = np.broadcast_to(
                dataset.poses[idx][:, -1], (n_vert, 3)
            ).astype(np.float32)
            rays_d = vertices_w - rays_o
            rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
            near = dataset.bounds.min() * np.ones((n_vert, 1), np.float32)
            far = depth.astype(np.float32)
            rays = np.concatenate([rays_o, rays_d, near, far], 1).astype(
                np.float32
            )
            if pad:
                rays = np.concatenate([rays, np.repeat(rays[-1:], pad, 0)], 0)
            pending.append((colors, depth, [
                occ_fn(params, jnp.asarray(rays[i : i + chunk]))
                for i in range(0, len(rays), chunk)
            ]))
            # keep a window of views in flight: enough async dispatches to
            # hide the tunnel latency, bounded device/host memory
            if len(pending) > 8:
                dc, dn = drain_one()
                v_color_sum += dc
                non_occluded_sum += dn
        while pending:
            dc, dn = drain_one()
            v_color_sum += dc
            non_occluded_sum += dn
        v_colors = v_color_sum / non_occluded_sum

    out_path = args.out_path or f"{args.scene_name}.ply"
    write_ply(out_path, vertices_w, triangles, v_colors.astype(np.uint8))
    print("Done!")
    return out_path
