"""Geometry invariants (mirrors test__utilities_module.c quaternion/rotation
consistency checks)."""
import numpy as np

from spatial_audio_framework_tpu.utils import geometry as geo


def test_sph_cart_roundtrip():
    rng = np.random.default_rng(0)
    sph = np.stack([rng.uniform(-np.pi, np.pi, 32),
                    rng.uniform(-np.pi / 2, np.pi / 2, 32),
                    rng.uniform(0.1, 5.0, 32)], -1)
    back = geo.cart2sph(geo.sph2cart(sph))
    np.testing.assert_allclose(back, sph, atol=1e-12)


def test_sph2cart_degrees():
    out = geo.sph2cart(np.array([[90.0, 0.0, 1.0]]), degrees=True)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-12)
    out = geo.sph2cart(np.array([[0.0, 90.0, 2.0]]), degrees=True)
    np.testing.assert_allclose(out, [[0.0, 0.0, 2.0]], atol=1e-12)


def test_rotation_orthogonality():
    R = geo.yaw_pitch_roll2_rzyx(0.3, -1.2, 2.0)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12


def test_quaternion_rotation_roundtrip():
    """quaternion ↔ rotation matrix consistency
    (test__utilities_module.c:196-203)."""
    rng = np.random.default_rng(1)
    for _ in range(16):
        ypr = rng.uniform(-np.pi, np.pi, 3) * [1, 0.49, 1]
        R = geo.yaw_pitch_roll2_rzyx(*ypr)
        q = geo.rotation_matrix2quaternion(R)
        R2 = geo.quaternion2rotation_matrix(q)
        np.testing.assert_allclose(R, R2, atol=1e-10)


def test_euler_conventions_compose():
    a, b, g = 0.2, -0.7, 1.1
    R = geo.euler2rotation_matrix(a, b, g, convention=geo.EULER_ROTATION_YAW_PITCH_ROLL)
    Rz = geo.euler2rotation_matrix(a, 0, 0, convention=geo.EULER_ROTATION_YAW_PITCH_ROLL)
    Ry = geo.euler2rotation_matrix(0, b, 0, convention=geo.EULER_ROTATION_YAW_PITCH_ROLL)
    Rx = geo.euler2rotation_matrix(0, 0, g, convention=geo.EULER_ROTATION_YAW_PITCH_ROLL)
    np.testing.assert_allclose(R, Rx @ Ry @ Rz, atol=1e-12)


def test_euler_quaternion_roundtrip():
    """euler2quaternion/quaternion2euler (saf_utility_geometry.c:123-213):
    round trip both supported conventions; quaternion consistent with the
    rotation-matrix path."""
    rng = np.random.default_rng(7)
    for conv in (geo.EULER_ROTATION_YAW_PITCH_ROLL,
                 geo.EULER_ROTATION_ROLL_PITCH_YAW):
        for _ in range(16):
            a, b, g = rng.uniform(-np.pi, np.pi, 3) * [1, 0.49, 1]
            q = geo.euler2quaternion(a, b, g, convention=conv)
            a2, b2, g2 = geo.quaternion2euler(q, convention=conv)
            np.testing.assert_allclose([a2, b2, g2], [a, b, g], atol=1e-10)
            # the C's euler2Quaternion relates to its euler2rotationMatrix
            # by a transposed YPR matrix with the z-angle in the alpha slot
            # (a quirk of the reference, mirrored verbatim:
            # saf_utility_geometry.c:123-161 labels alpha's half-angles as
            # the x-axis pair for YPR and the z-axis pair for RPY)
            za, ya, xa = (g, b, a) if conv == geo.EULER_ROTATION_YAW_PITCH_ROLL \
                else (a, b, g)
            np.testing.assert_allclose(
                geo.quaternion2rotation_matrix(q),
                geo.euler2rotation_matrix(
                    za, ya, xa,
                    convention=geo.EULER_ROTATION_YAW_PITCH_ROLL).T,
                atol=1e-10)
    # degrees flag
    q = geo.euler2quaternion(30.0, 20.0, -40.0, degrees=True)
    np.testing.assert_allclose(
        geo.quaternion2euler(q, degrees=True), [30.0, 20.0, -40.0],
        atol=1e-10)


def test_sph_voronoi_areas_match_scipy():
    """sphVoronoi + sphVoronoiAreas (saf_utility_geometry.c:693-945) agree
    with an independent scipy.spatial.SphericalVoronoi computation and tile
    the sphere.  (getVoronoiWeights IS this composition now, so the scipy
    cross-check must be explicit.)"""
    from scipy.spatial import SphericalVoronoi

    from spatial_audio_framework_tpu.utils.presets import tdesign

    dirs = tdesign(9)                      # 48-point t-design
    faces, verts = geo.sph_delaunay(dirs)
    vor, cells = geo.sph_voronoi(faces, verts)
    areas = geo.sph_voronoi_areas(vor, cells)
    assert abs(areas.sum() - 4.0 * np.pi) < 1e-4
    sv = SphericalVoronoi(verts, radius=1.0)
    sv.sort_vertices_of_regions()
    np.testing.assert_allclose(areas, sv.calculate_areas(), atol=5e-5)
    np.testing.assert_allclose(geo.get_voronoi_weights(dirs), areas,
                               atol=1e-7)


def test_sph_voronoi_dome_layout():
    """Cap-confined (dome) layouts put the origin OUTSIDE the convex hull,
    so circumcentre orientation must be judged against an interior point of
    the hull, not the origin (the big back face's circumcentre lies near the
    opposite pole).  Areas must still be positive and tile the sphere."""
    rng = np.random.default_rng(3)
    dirs = np.stack([rng.uniform(-180, 180, 24),
                     rng.uniform(20, 88, 24)], -1)
    faces, verts = geo.sph_delaunay(dirs)
    vor, cells = geo.sph_voronoi(faces, verts)
    areas = geo.sph_voronoi_areas(vor, cells)
    assert (areas > 0).all()
    assert abs(areas.sum() - 4.0 * np.pi) < 1e-4


def test_euler2quaternion_backend_dispatch():
    """Backend selection looks at ALL three angles (like
    euler2rotation_matrix), so mixed python-scalar / traced arguments work
    under jit and return jax arrays."""
    import jax
    import jax.numpy as jnp

    q = jax.jit(lambda b: geo.euler2quaternion(0.0, b, 0.0))(jnp.float32(0.3))
    assert isinstance(q, jnp.ndarray)
    np.testing.assert_allclose(
        np.asarray(q), geo.euler2quaternion(0.0, 0.3, 0.0), atol=1e-6)
