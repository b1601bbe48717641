"""Golden-value/property tests for the geometry layer (SURVEY.md §4 gap-fill)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.geom import conventions, lie, pose, procrustes, quaternion, rays

jax.config.update("jax_enable_x64", False)


def rand_rot(rng, n=None):
    """Random rotation matrices via QR."""
    shape = (3, 3) if n is None else (n, 3, 3)
    A = rng.standard_normal(shape)
    Q, R = np.linalg.qr(A)
    d = np.sign(np.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[..., None, :]
    det = np.linalg.det(Q)
    Q[..., :, 0] *= np.where(det < 0, -1.0, 1.0)[..., None]
    return jnp.asarray(Q, dtype=jnp.float32)


class TestLie:
    def test_so3_roundtrip(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.uniform(-1.5, 1.5, (32, 3)), jnp.float32)
        R = lie.so3_to_SO3(w)
        # R is a rotation
        I = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.broadcast_to(I, R.shape), atol=1e-5)
        w2 = lie.SO3_to_so3(R)
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_se3_roundtrip(self):
        rng = np.random.default_rng(1)
        wu = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 6)), jnp.float32)
        Rt = lie.se3_to_SE3(wu)
        wu2 = lie.SE3_to_se3(Rt)
        np.testing.assert_allclose(wu, wu2, atol=1e-4)

    def test_zero_is_identity(self):
        Rt = lie.se3_to_SE3(jnp.zeros((6,)))
        np.testing.assert_allclose(Rt, jnp.eye(3, 4), atol=1e-6)

    def test_taylor_matches_closed_form(self):
        x = jnp.asarray(np.linspace(0.05, 2.0, 50), jnp.float32)
        np.testing.assert_allclose(lie.taylor_A(x), np.sin(x) / x, atol=1e-5)
        np.testing.assert_allclose(lie.taylor_B(x), (1 - np.cos(x)) / x**2, atol=1e-5)
        np.testing.assert_allclose(lie.taylor_C(x), (x - np.sin(x)) / x**3, atol=1e-5)

    def test_grad_at_zero_finite(self):
        g = jax.grad(lambda w: lie.so3_to_SO3(w).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestPose:
    def test_invert_compose(self):
        rng = np.random.default_rng(2)
        R = rand_rot(rng, 8)
        t = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
        p = pose.make_pose(R=R, t=t)
        pinv = pose.invert_pose(p)
        ident = pose.compose_pair(p, pinv)
        np.testing.assert_allclose(ident, jnp.broadcast_to(jnp.eye(3, 4), ident.shape), atol=1e-5)

    def test_world_cam_roundtrip(self):
        rng = np.random.default_rng(3)
        R = rand_rot(rng, 2)
        t = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
        p = pose.make_pose(R=R, t=t)
        X = jnp.asarray(rng.standard_normal((2, 11, 3)), jnp.float32)
        Xc = pose.world2cam(X, p)
        Xw = pose.cam2world(Xc, p)
        np.testing.assert_allclose(X, Xw, atol=1e-5)

    def test_rotation_distance(self):
        rng = np.random.default_rng(4)
        R1 = rand_rot(rng, 4)
        angle = pose.rotation_distance(R1, R1)
        np.testing.assert_allclose(angle, 0.0, atol=2e-3)
        # rotation by known angle about Z
        a = jnp.asarray([0.3])
        Rz = pose.angle_to_rotation_matrix(a, "Z")
        d = pose.rotation_distance(Rz, jnp.eye(3)[None])
        np.testing.assert_allclose(d, a, atol=1e-5)


class TestProcrustes:
    def test_recovers_known_sim3(self):
        rng = np.random.default_rng(5)
        X0 = jnp.asarray(rng.standard_normal((40, 3)), jnp.float32)
        R = rand_rot(rng)
        s, t = 2.3, jnp.asarray([0.5, -1.0, 2.0], jnp.float32)
        X1 = s * (X0 @ R.T) + t  # a sim3-distorted copy
        sim3 = procrustes.procrustes_analysis(X0, X1)
        X1to0 = procrustes.apply_sim3(sim3, X1)
        np.testing.assert_allclose(X1to0, X0, atol=1e-4)

    def test_reflection_guard(self):
        rng = np.random.default_rng(6)
        X0 = jnp.asarray(rng.standard_normal((30, 3)), jnp.float32)
        X1 = X0 * jnp.asarray([1.0, 1.0, -1.0])  # mirrored: best orthogonal has det -1
        sim3 = procrustes.procrustes_analysis(X0, X1)
        assert np.linalg.det(np.asarray(sim3.R)) > 0


class TestQuaternion:
    def test_q_R_roundtrip(self):
        rng = np.random.default_rng(7)
        R = rand_rot(rng, 64)
        q = quaternion.R_to_q(R)
        R2 = quaternion.q_to_R(q)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_product_matches_composition(self):
        rng = np.random.default_rng(8)
        R1, R2 = rand_rot(rng, 2)
        q1, q2 = quaternion.R_to_q(R1), quaternion.R_to_q(R2)
        q12 = quaternion.q_product(q1, q2)
        np.testing.assert_allclose(quaternion.q_to_R(q12), R1 @ R2, atol=1e-4)


class TestRays:
    def test_identity_pose_rays(self):
        H = W = 4
        f = 10.0
        intr = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])[None]
        p = pose.make_pose(R=jnp.eye(3), t=jnp.zeros(3))[None]
        center, ray = rays.get_center_and_ray(p, intr, H, W)
        np.testing.assert_allclose(center, 0.0, atol=1e-6)
        # center pixel ray points along +z
        mid = ray[0].reshape(H, W, 3)
        assert mid[2, 2, 2] > 0
        # pixel (0.5, 0.5): direction ((0.5-2)/f, (0.5-2)/f, 1)
        np.testing.assert_allclose(mid[0, 0], jnp.asarray([-1.5 / f, -1.5 / f, 1.0]), atol=1e-5)

    def test_translation_moves_center(self):
        H = W = 2
        intr = jnp.asarray([[1.0, 0, 1], [0, 1.0, 1], [0, 0, 1]])[None]
        t = jnp.asarray([1.0, 2.0, 3.0])
        p = pose.make_pose(R=jnp.eye(3), t=t)[None]
        center, _ = rays.get_center_and_ray(p, intr, H, W)
        np.testing.assert_allclose(center[0, 0], -t, atol=1e-5)  # center = -R^T t

    def test_blender_directions(self):
        d = rays.get_ray_directions(4, 4, 2.0, blender=True)
        assert d.shape == (4, 4, 3)
        np.testing.assert_allclose(d[..., 2], -1.0)

    def test_rays_from_directions_normalised(self):
        d = rays.get_ray_directions(3, 3, 2.0, blender=True)
        c2w = jnp.eye(3, 4)
        o, v = rays.get_rays_from_directions(d, c2w)
        np.testing.assert_allclose(jnp.linalg.norm(v, axis=-1), 1.0, atol=1e-6)
        assert o.shape == (9, 3)

    def test_ndc_origin_on_near_plane(self):
        intr = jnp.asarray([[2.0, 0, 1.0], [0, 2.0, 1.0], [0, 0, 1]])[None]
        center = jnp.zeros((1, 5, 3))
        ray = jnp.concatenate([jnp.linspace(-0.2, 0.2, 5)[None, :, None],
                               jnp.zeros((1, 5, 1)), jnp.ones((1, 5, 1))], -1)
        c_ndc, r_ndc = rays.convert_ndc(center, ray, intr, near=1.0)
        np.testing.assert_allclose(c_ndc[..., 2], -1.0, atol=1e-6)  # 1 - 2*near/cz with cz=near


class TestConventions:
    def test_barf_parse_unparse(self):
        rng = np.random.default_rng(9)
        R = rand_rot(rng)
        c2w = jnp.concatenate([jnp.concatenate([R, jnp.asarray(rng.standard_normal((3, 1)), jnp.float32)], 1),
                               jnp.asarray([[0, 0, 0, 1.0]])], 0)
        p = conventions.parse_raw_camera_barf(c2w)
        back = conventions.unparse_camera_barf(p)
        np.testing.assert_allclose(back, c2w[:3], atol=1e-5)

    def test_ngp_roundtrip(self):
        rng = np.random.default_rng(10)
        m = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
        scale, offset = conventions.NERF_SCALE, jnp.asarray([0.5, 0.5, 0.5])
        ngp = conventions.matrix_nerf2ngp(m, scale, offset)
        back = conventions.matrix_ngp2nerf(ngp, scale, offset)
        np.testing.assert_allclose(back, m, atol=1e-5)

    def test_blender2opencv_flips_yz(self):
        c2w = jnp.eye(4)
        out = conventions.blender2opencv(c2w)
        np.testing.assert_allclose(jnp.diag(out), jnp.asarray([1.0, -1.0, -1.0, 1.0]))
