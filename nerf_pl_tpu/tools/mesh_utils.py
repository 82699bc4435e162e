"""Mesh utilities for colored-mesh extraction (reference
``extract_color_mesh.py`` dependencies, re-implemented dependency-free):

  * ``marching_tetrahedra`` — iso-surface triangulation of a dense sigma
    grid.  The reference shells out to PyMCubes' marching cubes
    (``extract_color_mesh.py:144``); here each grid cell is decomposed into
    6 tetrahedra and triangulated by the 16-case marching-tetrahedra rule —
    same capability, fully vectorized numpy, no lookup-table blob.
    Vertex coordinates come out in grid-index space like mcubes'.
  * ``keep_largest_cluster`` — reference uses open3d's
    ``cluster_connected_triangles`` (``extract_color_mesh.py:164-171``);
    here scipy's sparse connected components over the vertex graph.
  * ``write_ply`` — binary little-endian PLY with optional per-vertex color
    (replaces the plyfile dependency, ``extract_color_mesh.py:255-297``).
  * ``bilinear_sample`` — per-point bilinear image lookup (replaces
    ``cv2.remap``, ``extract_color_mesh.py:237-244``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# The 6-tetrahedra (Kuhn) decomposition of a unit cube around the main
# diagonal 0-7 (corner c = (x, y, z) bits -> index c = x*4 + y*2 + z);
# every tet contains the diagonal so the pieces tile the cube exactly.
_CUBE_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int64,
)
# corner offsets in (x, y, z)
_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
    dtype=np.int64,
)

# Marching-tetrahedra case table: for each of the 16 sign configurations of
# a tet's 4 corners, the list of cut edges (pairs of local corner indices)
# forming 0, 1 or 2 triangles.  Edge order fixes a consistent winding.
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
_TET_TRIS = {
    0b0000: [],
    0b0001: [[(0, 3), (1, 3), (2, 3)]],          # corner 3 inside
    0b0010: [[(0, 2), (2, 3), (1, 2)]],          # corner 2 inside
    0b0100: [[(0, 1), (1, 2), (1, 3)]],          # corner 1 inside
    0b1000: [[(0, 1), (0, 3), (0, 2)]],          # corner 0 inside
    0b0011: [[(0, 2), (1, 3), (1, 2)], [(0, 2), (0, 3), (1, 3)]],
    0b0101: [[(0, 1), (1, 2), (2, 3)], [(0, 1), (2, 3), (0, 3)]],
    0b1001: [[(0, 1), (1, 3), (2, 3)], [(0, 1), (2, 3), (0, 2)]],
    0b0110: [[(0, 1), (0, 2), (2, 3)], [(0, 1), (2, 3), (1, 3)]],
    0b1010: [[(0, 1), (2, 3), (1, 2)], [(0, 1), (0, 3), (2, 3)]],
    0b1100: [[(0, 2), (0, 3), (1, 3)], [(0, 2), (1, 3), (1, 2)]],
    0b0111: [[(0, 1), (0, 2), (0, 3)]],          # corner 0 outside
    0b1011: [[(0, 1), (1, 3), (1, 2)]],          # corner 1 outside
    0b1101: [[(0, 2), (1, 2), (2, 3)]],          # corner 2 outside
    0b1110: [[(0, 3), (2, 3), (1, 3)]],          # corner 3 outside
    0b1111: [],
}


def marching_tetrahedra(
    volume: np.ndarray, threshold: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface ``volume == threshold``.

    Args:
      volume: (N, N, N) scalar field (density).
    Returns:
      (vertices (V, 3) float32 in grid-index coordinates, triangles (T, 3)
      int64) — deduplicated vertices on cell edges.
    """
    n = volume.shape[0]
    inside = volume > threshold
    # only cells whose 8 corners straddle the surface contribute
    c = inside[:-1, :-1, :-1]
    any_in = c.copy()
    all_in = c.copy()
    for dx, dy, dz in _CORNERS[1:]:
        blk = inside[dx : n - 1 + dx, dy : n - 1 + dy, dz : n - 1 + dz]
        any_in |= blk
        all_in &= blk
    active = np.argwhere(any_in & ~all_in)  # (C, 3) cell origins
    if len(active) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # corner values/positions for every active cell: (C, 8)
    corner_pos = active[:, None, :] + _CORNERS[None, :, :]  # (C, 8, 3)
    vals = volume[
        corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]
    ]  # (C, 8)

    tri_edge_a = []  # flattened per-triangle edge endpoint grid coords
    tri_edge_b = []
    for tet in _CUBE_TETS:
        tvals = vals[:, tet]  # (C, 4)
        tins = tvals > threshold
        code = (
            (tins[:, 0] << 3) | (tins[:, 1] << 2) | (tins[:, 2] << 1)
            | tins[:, 3]
        )
        for case, tris in _TET_TRIS.items():
            if not tris:
                continue
            sel = np.nonzero(code == case)[0]
            if len(sel) == 0:
                continue
            pos = corner_pos[sel][:, tet]  # (S, 4, 3)
            for tri in tris:
                for (ea, eb) in tri:
                    tri_edge_a.append(pos[:, ea])
                    tri_edge_b.append(pos[:, eb])
    if not tri_edge_a:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    return _dedup_and_interp(tri_edge_a, tri_edge_b, volume, threshold)


def _dedup_and_interp(tri_edge_a, tri_edge_b, volume, threshold):
    """Build deduplicated interpolated vertices + triangle index list from
    per-edge corner coordinate lists (each list element: (S, 3) for one
    triangle-corner slot emitted in groups of 3)."""
    # Each consecutive group of 3 entries in tri_edge_a/b is one triangle's
    # corners for a batch of S cells.
    corners_a = []
    corners_b = []
    for i in range(0, len(tri_edge_a), 3):
        batch = np.stack(
            [tri_edge_a[i], tri_edge_a[i + 1], tri_edge_a[i + 2]], axis=1
        )  # (S, 3, 3)
        corners_a.append(batch.reshape(-1, 3))
        batch_b = np.stack(
            [tri_edge_b[i], tri_edge_b[i + 1], tri_edge_b[i + 2]], axis=1
        )
        corners_b.append(batch_b.reshape(-1, 3))
    A = np.concatenate(corners_a, 0)  # (3T, 3) int grid coords, tri-major
    B = np.concatenate(corners_b, 0)

    # canonical edge key (sorted endpoints) for dedup
    swap = (A[:, 0] > B[:, 0]) | (
        (A[:, 0] == B[:, 0])
        & ((A[:, 1] > B[:, 1]) | ((A[:, 1] == B[:, 1]) & (A[:, 2] > B[:, 2])))
    )
    lo = np.where(swap[:, None], B, A)
    hi = np.where(swap[:, None], A, B)
    n = volume.shape[0]
    key = (
        ((lo[:, 0] * n + lo[:, 1]) * n + lo[:, 2]) * (n * n * n)
        + (hi[:, 0] * n + hi[:, 1]) * n
        + hi[:, 2]
    )
    uniq, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
    ulo, uhi = lo[first_idx], hi[first_idx]
    va = volume[ulo[:, 0], ulo[:, 1], ulo[:, 2]]
    vb = volume[uhi[:, 0], uhi[:, 1], uhi[:, 2]]
    t = (threshold - va) / np.where(vb - va == 0, 1e-12, vb - va)
    t = np.clip(t, 0.0, 1.0)[:, None]
    verts = ulo.astype(np.float32) * (1 - t) + uhi.astype(np.float32) * t
    tris = inv.reshape(-1, 3).astype(np.int64)
    # drop degenerate triangles (duplicate vertices)
    good = (
        (tris[:, 0] != tris[:, 1])
        & (tris[:, 1] != tris[:, 2])
        & (tris[:, 0] != tris[:, 2])
    )
    return verts, tris[good]


def keep_largest_cluster(
    vertices: np.ndarray, triangles: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep only the largest connected component of the triangle mesh."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    if len(triangles) == 0:
        return vertices, triangles
    nv = len(vertices)
    e = np.concatenate(
        [triangles[:, [0, 1]], triangles[:, [1, 2]], triangles[:, [0, 2]]], 0
    )
    adj = coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(nv, nv)
    )
    ncomp, labels = connected_components(adj, directed=False)
    if ncomp <= 1:
        return vertices, triangles
    largest = np.argmax(np.bincount(labels, minlength=ncomp))
    keep_v = labels == largest
    keep_t = keep_v[triangles].all(axis=1)
    remap = -np.ones(nv, np.int64)
    remap[keep_v] = np.arange(keep_v.sum())
    return vertices[keep_v], remap[triangles[keep_t]]


def write_ply(
    path: str,
    vertices: np.ndarray,
    triangles: np.ndarray,
    colors: Optional[np.ndarray] = None,
) -> None:
    """Binary little-endian PLY with optional uchar vertex colors."""
    nv, nt = len(vertices), len(triangles)
    props = ["property float x", "property float y", "property float z"]
    if colors is not None:
        props += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    header = "\n".join(
        [
            "ply",
            "format binary_little_endian 1.0",
            f"element vertex {nv}",
            *props,
            f"element face {nt}",
            "property list uchar int vertex_indices",
            "end_header",
            "",
        ]
    )
    if colors is not None:
        vdt = np.dtype(
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
             ("red", "u1"), ("green", "u1"), ("blue", "u1")]
        )
        v = np.empty(nv, vdt)
        v["x"], v["y"], v["z"] = vertices.T.astype(np.float32)
        v["red"], v["green"], v["blue"] = colors.T.astype(np.uint8)
    else:
        vdt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        v = np.empty(nv, vdt)
        v["x"], v["y"], v["z"] = vertices.T.astype(np.float32)
    fdt = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
    f = np.empty(nt, fdt)
    f["n"] = 3
    f["idx"] = triangles.astype(np.int32)
    with open(path, "wb") as fh:
        fh.write(header.encode())
        v.tofile(fh)
        f.tofile(fh)


def read_ply(path: str):
    """Minimal reader for the PLYs written by ``write_ply`` (tests/tools)."""
    with open(path, "rb") as fh:
        assert fh.readline().strip() == b"ply"
        nv = nt = 0
        has_color = False
        while True:
            line = fh.readline().strip()
            if line.startswith(b"element vertex"):
                nv = int(line.split()[-1])
            elif line.startswith(b"element face"):
                nt = int(line.split()[-1])
            elif line == b"property uchar red":
                has_color = True
            elif line == b"end_header":
                break
        if has_color:
            vdt = np.dtype(
                [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                 ("red", "u1"), ("green", "u1"), ("blue", "u1")]
            )
        else:
            vdt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
        v = np.fromfile(fh, vdt, nv)
        fdt = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
        f = np.fromfile(fh, fdt, nt)
    verts = np.stack([v["x"], v["y"], v["z"]], 1)
    colors = (
        np.stack([v["red"], v["green"], v["blue"]], 1) if has_color else None
    )
    return verts, f["idx"].astype(np.int64), colors


def bilinear_sample(image: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Sample image (H, W, C) at float pixel coords with bilinear interp."""
    H, W = image.shape[:2]
    x0 = np.clip(np.floor(x).astype(np.int64), 0, W - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    fx = np.clip(x - x0, 0.0, 1.0)[:, None]
    fy = np.clip(y - y0, 0.0, 1.0)[:, None]
    img = image.astype(np.float32)
    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return top * (1 - fy) + bot * fy


_VOL_MAGIC = b"NVOL"


def save_vol(path: str, sigma_grid: np.ndarray, x_range, y_range, z_range):
    """Write a density grid as a ``.vol`` volume-texture file.

    Capability parity with the reference's Unity VolumeRender export
    (``README_Unity.md:22-28`` — its notebook cell "Generate .vol file for
    volume rendering in Unity" is a missing large blob upstream, and its
    binary layout lives in an external Unity plugin, so this framework
    defines a self-describing little-endian layout instead):

      bytes 0-3   magic ``NVOL``
      int32       version (1)
      int32 ×3    nx, ny, nz
      float32 ×6  x_min, x_max, y_min, y_max, z_min, z_max (world bounds)
      float32     sigma_max (the value a payload byte of 255 maps back to)
      uint8 ×nxyz densities, ``round(255 * clip(sigma, 0, sigma_max) /
                  sigma_max)``, x-major / z-fastest — directly loadable
                  into a Texture3D R8 channel.

    Args:
      sigma_grid: (nx, ny, nz) non-negative densities, x/y/z index order.
    """
    grid = np.maximum(np.asarray(sigma_grid, np.float32), 0.0)
    sigma_max = float(grid.max()) or 1.0
    payload = np.round(255.0 * grid / sigma_max).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(_VOL_MAGIC)
        np.array([1, *grid.shape], np.int32).tofile(f)
        np.array([*x_range, *y_range, *z_range, sigma_max], np.float32).tofile(f)
        payload.tofile(f)


def read_vol(path: str):
    """Read a ``save_vol`` file back -> (sigma_grid f32, (xr, yr, zr))."""
    with open(path, "rb") as f:
        assert f.read(4) == _VOL_MAGIC, "not a NVOL file"
        version, nx, ny, nz = np.fromfile(f, np.int32, 4)
        assert version == 1, version
        meta = np.fromfile(f, np.float32, 7)
        payload = np.fromfile(f, np.uint8, nx * ny * nz)
    grid = payload.reshape(nx, ny, nz).astype(np.float32) * meta[6] / 255.0
    return grid, (meta[0:2], meta[2:4], meta[4:6])
