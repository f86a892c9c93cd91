"""Camera-class tests: project/unproject round trip with distortion."""
import numpy as np

from apnerf.utils.camera import Camera


def _cam(**kw):
    base = dict(orientation=np.eye(3), position=np.zeros(3),
                focal_length=100.0, principal_point=np.array([32.0, 24.0]),
                image_size=np.array([64, 48]))
    base.update(kw)
    return Camera(**base)


def test_project_unproject_roundtrip_no_distortion():
    cam = _cam()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.2, 0.2, (20, 3)) + [0, 0, 3.0]
    pix = cam.project(pts)
    rays = cam.pixels_to_rays(pix)
    # rays from the camera through the points
    expected = pts - cam.position
    expected /= np.linalg.norm(expected, axis=-1, keepdims=True)
    np.testing.assert_allclose(rays, expected, atol=1e-6)


def test_project_unproject_roundtrip_with_distortion():
    cam = _cam(radial_distortion=np.array([0.05, -0.01, 0.0]),
               tangential_distortion=np.array([0.001, -0.002]))
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.2, 0.2, (20, 3)) + [0, 0, 3.0]
    pix = cam.project(pts)
    rays = cam.pixels_to_rays(pix)
    expected = pts - cam.position
    expected /= np.linalg.norm(expected, axis=-1, keepdims=True)
    np.testing.assert_allclose(rays, expected, atol=1e-4)


def test_scale_and_crop():
    cam = _cam()
    half = cam.scale(0.5)
    assert half.focal_length == 50.0
    np.testing.assert_allclose(half.principal_point, [16.0, 12.0])
    cropped = cam.crop(left=4, top=2)
    np.testing.assert_allclose(cropped.principal_point, [28.0, 22.0])
    np.testing.assert_array_equal(cropped.image_size, [60, 46])


def test_look_at_points_camera_at_target():
    cam = _cam()
    c2 = cam.look_at(np.array([0, 0, 5.0]), np.zeros(3),
                     np.array([0, 1.0, 0]))
    # optical axis points from camera to origin
    np.testing.assert_allclose(c2.optical_axis, [0, 0, -1.0], atol=1e-6)
    pix = c2.project(np.zeros((1, 3)))
    np.testing.assert_allclose(pix[0], cam.principal_point, atol=1e-6)
