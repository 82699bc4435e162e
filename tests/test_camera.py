import numpy as np

from nerf_pl_tpu.models.camera import (
    COORD_TRANS,
    Camera,
    c2w_from_lookat,
    intrinsic_matrix,
    pose_from_blender_matrix,
    transformation_between,
)


def test_intrinsic_matrix_columns():
    """M = [a,b,c] with a=(1,0,0), b=(0,-1,0),
    c=(-w/2, h/2, -w/(2 tan(hfov/2))) (models/camera.py:20-31)."""
    M = intrinsic_matrix(90.0, (400, 400))
    np.testing.assert_allclose(M[:, 0], [1, 0, 0])
    np.testing.assert_allclose(M[:, 1], [0, -1, 0])
    np.testing.assert_allclose(M[:, 2], [-200, 200, -200], rtol=1e-5)


def test_lookat_c2w_orthonormal():
    eye = np.array([3.0, 2.0, 5.0], np.float32)
    c2w = c2w_from_lookat(eye, np.zeros(3, np.float32))
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(c2w[:3, 3], eye)
    # back vector points from lookat to eye
    back = eye / np.linalg.norm(eye)
    np.testing.assert_allclose(c2w[:3, 2], back, atol=1e-5)


def test_pose_from_blender_matrix():
    M = intrinsic_matrix(60.0, (100, 100))
    rng = np.random.RandomState(0)
    Rw = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    t = rng.randn(3).astype(np.float32)
    c2w = np.concatenate([Rw, t[:, None]], axis=1)
    cam, eye = pose_from_blender_matrix(M, c2w)
    np.testing.assert_allclose(eye, t, rtol=1e-5)
    np.testing.assert_allclose(cam, Rw @ M, rtol=1e-5)


def test_transformation_between_same_camera_is_identity():
    M = intrinsic_matrix(45.0, (64, 64))
    eye = np.array([1.0, 2.0, 3.0], np.float32)
    R, Q = transformation_between(M, eye, M, eye)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(Q, np.zeros(3), atol=1e-6)


def test_camera_class_api():
    cam = Camera.create(30.0, (400, 400))
    assert cam.get_a().shape == (3,)
    c2w = np.eye(3, 4, dtype=np.float32)
    cam.set_pose_using_blender_matrix(c2w)
    np.testing.assert_allclose(cam.eye_pos, 0)
    light = Camera.from_camera_eyepos(
        eye_pos=np.ones(3, np.float32), camera=cam.camera
    )
    R, Q = cam.get_transformation_to(light)
    assert R.shape == (3, 3) and Q.shape == (3,)


def test_coord_trans_is_blender_flip():
    # x right, y in, z up  ->  x right, y up, z out
    v = np.array([1.0, 2.0, 3.0, 1.0], np.float32)
    out = COORD_TRANS @ v
    np.testing.assert_allclose(out[:3], [1.0, -3.0, 2.0])


def test_camera_eq_does_not_raise():
    from nerf_pl_tpu.models.camera import Camera, intrinsic_matrix

    a = Camera(camera=intrinsic_matrix(0.8, (8, 8)))
    b = Camera(camera=intrinsic_matrix(0.8, (8, 8)))
    assert (a == b) is False  # identity comparison, never an array ValueError
    assert a == a
