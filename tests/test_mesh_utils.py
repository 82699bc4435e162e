import numpy as np

from nerf_pl_tpu.tools.mesh_utils import (
    bilinear_sample,
    keep_largest_cluster,
    marching_tetrahedra,
    read_ply,
    write_ply,
)


def _sphere_volume(n=48, r=0.6):
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return 10.0 * (r - np.sqrt(X**2 + Y**2 + Z**2)), n


def test_sphere_surface_accuracy():
    vol, n = _sphere_volume()
    v, t = marching_tetrahedra(vol, 0.0)
    assert len(v) > 1000 and len(t) > 2000
    w = v / (n - 1) * 2 - 1
    r = np.linalg.norm(w, axis=1)
    assert abs(r.mean() - 0.6) < 2e-3
    assert r.std() < 2e-3
    # all triangle indices valid
    assert t.min() >= 0 and t.max() < len(v)


def test_empty_and_full_volumes():
    vol = np.full((8, 8, 8), -1.0)
    v, t = marching_tetrahedra(vol, 0.0)
    assert len(v) == 0 and len(t) == 0
    v, t = marching_tetrahedra(-vol, 0.0)  # fully inside: no crossings
    assert len(t) == 0


def test_keep_largest_cluster_removes_satellite():
    vol, n = _sphere_volume()
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    blob = 10.0 * (0.08 - np.sqrt((X - 0.9) ** 2 + (Y - 0.9) ** 2 + (Z - 0.9) ** 2))
    v_main, t_main = marching_tetrahedra(vol, 0.0)
    v2, t2 = marching_tetrahedra(np.maximum(vol, blob), 0.0)
    assert len(t2) > len(t_main)
    v3, t3 = keep_largest_cluster(v2, t2)
    assert len(t3) == len(t_main)
    assert t3.max() < len(v3)


def test_ply_roundtrip(tmp_path):
    vol, n = _sphere_volume(16, 0.5)
    v, t = marching_tetrahedra(vol, 0.0)
    colors = np.clip(v / n * 255, 0, 255).astype(np.uint8)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, t, colors)
    rv, rt, rc = read_ply(p)
    np.testing.assert_allclose(rv, v, atol=1e-6)
    np.testing.assert_array_equal(rt, t)
    np.testing.assert_array_equal(rc, colors)
    # colorless variant
    p2 = str(tmp_path / "m2.ply")
    write_ply(p2, v, t)
    rv2, rt2, rc2 = read_ply(p2)
    assert rc2 is None and len(rv2) == len(v)


def test_bilinear_sample_exact():
    img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    out = bilinear_sample(img, np.array([0.5, 1.0, 3.0]), np.array([0.5, 2.0, 2.0]))
    np.testing.assert_allclose(out.ravel(), [2.5, 9.0, 11.0])


def test_vol_roundtrip(tmp_path):
    from nerf_pl_tpu.tools.mesh_utils import read_vol, save_vol

    rng = np.random.default_rng(0)
    grid = rng.uniform(0, 37.0, size=(8, 6, 10)).astype(np.float32)
    path = str(tmp_path / "scene.vol")
    save_vol(path, grid, (-1.0, 1.0), (-0.5, 0.5), (0.0, 2.0))
    back, (xr, yr, zr) = read_vol(path)
    assert back.shape == grid.shape
    # uint8 quantization: within half a step of sigma_max/255
    assert np.abs(back - grid).max() <= grid.max() / 255.0 * 0.5 + 1e-6
    assert tuple(xr) == (-1.0, 1.0) and tuple(zr) == (0.0, 2.0)


def test_vol_all_zero(tmp_path):
    from nerf_pl_tpu.tools.mesh_utils import read_vol, save_vol

    path = str(tmp_path / "zero.vol")
    save_vol(path, np.zeros((4, 4, 4), np.float32), (0, 1), (0, 1), (0, 1))
    back, _ = read_vol(path)
    assert (back == 0).all()


def test_grid_vertices_to_world_asymmetric_ranges():
    """Regression: the reference's x/y swap (extract_color_mesh.py:148-155)
    applies the wrong range offsets when x_range != y_range (its equal-range
    assert is commented out). Analytic oracle: an offset ball must land at
    its true world center regardless of per-axis ranges."""
    from nerf_pl_tpu.tools.extract_mesh import grid_vertices_to_world

    xr, yr, zr = (-1.0, 1.0), (-0.5, 1.5), (-0.8, 1.2)
    n = 64
    x = np.linspace(*xr, n)
    y = np.linspace(*yr, n)
    z = np.linspace(*zr, n)
    xyz = np.stack(np.meshgrid(x, y, z), -1).reshape(-1, 3)
    c = np.array([0.3, 0.9, -0.2])
    sigma = (np.linalg.norm(xyz - c, axis=1) < 0.4).astype(np.float32) * 10
    v, t = marching_tetrahedra(sigma.reshape(n, n, n), 5.0)
    w = grid_vertices_to_world(v, n, xr, yr, zr)
    assert np.allclose(w.mean(0), c, atol=0.05)
    r = np.linalg.norm(w - c, axis=1)
    assert abs(r.mean() - 0.4) < 0.02 and r.std() < 0.05
