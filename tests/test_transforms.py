import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from splatam_tpu.core import transforms as T


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_build_rotation_matches_scipy():
    q = random_quats(32)
    r_ours = np.asarray(T.build_rotation(jnp.asarray(q, jnp.float32)))
    # scipy uses xyzw ordering
    r_scipy = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(r_ours, r_scipy, atol=1e-5)


def test_quat_mult_matches_rotation_composition():
    q1 = random_quats(16, seed=1)
    q2 = random_quats(16, seed=2)
    q12 = np.asarray(T.quat_mult(jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32)))
    r1 = Rotation.from_quat(q1[:, [1, 2, 3, 0]]).as_matrix()
    r2 = Rotation.from_quat(q2[:, [1, 2, 3, 0]]).as_matrix()
    r12 = np.asarray(T.build_rotation(jnp.asarray(q12)))
    np.testing.assert_allclose(r12, r1 @ r2, atol=1e-5)


def test_matrix_to_quaternion_roundtrip():
    q = random_quats(64, seed=3)
    r = np.asarray(T.build_rotation(jnp.asarray(q, jnp.float32)))
    q_back = np.asarray(T.matrix_to_quaternion(jnp.asarray(r)))
    r_back = np.asarray(T.build_rotation(jnp.asarray(q_back)))
    np.testing.assert_allclose(r_back, r, atol=1e-5)


def test_relative_transformation_identity_first_frame():
    rng = np.random.default_rng(4)
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    for i in range(5):
        poses[i, :3, :3] = Rotation.random(random_state=int(rng.integers(1 << 16))).as_matrix()
        poses[i, :3, 3] = rng.normal(size=3)
    rel = np.asarray(
        T.relative_transformation(jnp.asarray(np.tile(poses[0], (5, 1, 1))), jnp.asarray(poses))
    )
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-5)
    np.testing.assert_allclose(rel[2], np.linalg.inv(poses[0]) @ poses[2], atol=1e-5)


def test_pose_to_w2c():
    q = random_quats(1, seed=5)[0]
    t = np.array([0.3, -0.2, 1.0], np.float32)
    m = np.asarray(T.pose_to_w2c(jnp.asarray(q, jnp.float32), jnp.asarray(t)))
    r = Rotation.from_quat(q[[1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(m[:3, :3], r, atol=1e-5)
    np.testing.assert_allclose(m[:3, 3], t, atol=1e-6)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=0)
