import numpy as np
import pytest

from nerf_pl_tpu.ops.ray_utils import get_ndc_rays, get_ray_directions, get_rays


def test_directions_no_half_pixel_offset():
    """Parity check: pixel (0,0) maps to ((0-W/2)/f, -(0-H/2)/f, -1)
    — deliberately NO +0.5 centering (datasets/ray_utils.py:19-22)."""
    H = W = 4
    f = 10.0
    d = get_ray_directions(H, W, f)
    assert d.shape == (4, 4, 3)
    np.testing.assert_allclose(d[0, 0], [(0 - 2) / f, -(0 - 2) / f, -1])
    np.testing.assert_allclose(d[3, 1], [(1 - 2) / f, -(3 - 2) / f, -1])


def test_get_rays_world_frame():
    H = W = 3
    d = get_ray_directions(H, W, 5.0)
    c2w = np.array(
        [[0, 0, 1, 10], [0, 1, 0, -2], [-1, 0, 0, 3]], dtype=np.float32
    )
    o, dd = get_rays(d, c2w)
    assert o.shape == (9, 3) and dd.shape == (9, 3)
    np.testing.assert_allclose(o, np.broadcast_to([10, -2, 3], (9, 3)))
    np.testing.assert_allclose(np.linalg.norm(dd, axis=-1), 1.0, rtol=1e-6)
    # rotation applied: world dir = R @ cam_dir (normalized)
    cam = d.reshape(-1, 3)[4]
    want = c2w[:, :3] @ cam
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(dd[4], want, rtol=1e-6)


def test_ndc_rays_formula():
    rng = np.random.RandomState(0)
    H, W, f, near = 8, 8, 10.0, 1.0
    o = rng.randn(16, 3).astype(np.float32)
    d = rng.randn(16, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5  # forward-facing
    o[:, 2] = -np.abs(o[:, 2]) - 3.0
    no, nd = get_ndc_rays(H, W, f, near, o, d)
    # origins land on the near plane: o2 = 1 + 2*near/oz
    t = -(near + o[:, 2]) / d[:, 2]
    oz = (o + t[:, None] * d)[:, 2]
    np.testing.assert_allclose(no[:, 2], 1 + 2 * near / oz, rtol=1e-5)
    # d2 = 1 - o2
    np.testing.assert_allclose(nd[:, 2], 1 - no[:, 2], rtol=1e-5)


def test_rays_parity_with_torch_reference_math():
    torch = pytest.importorskip("torch")
    H = W = 5
    f = 7.0
    d = get_ray_directions(H, W, f)
    # torch equivalent built from meshgrid semantics
    j, i = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    want = torch.stack(
        [(i - W / 2) / f, -(j - H / 2) / f, -torch.ones_like(i)], -1
    ).numpy()
    np.testing.assert_allclose(d, want, rtol=1e-6)


def test_get_rays_mixed_numpy_jax_under_jit():
    """numpy directions constant + traced c2w must not force np.asarray on a
    tracer (dispatch considers both operands)."""
    import jax
    import jax.numpy as jnp

    dirs = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    c2w = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    o, d = jax.jit(lambda m: get_rays(dirs, m))(c2w)
    assert o.shape == (4, 3) and bool(jnp.isfinite(d).all())
