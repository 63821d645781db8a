"""Spatial math: quaternions, rotations, 6-D motion/force algebra.

Conventions follow MuJoCo so that state is interchangeable with the host
oracle used in parity tests:
  * quaternions are (w, x, y, z), unit norm
  * spatial (Plücker) vectors are ordered (angular[3], linear[3]), expressed
    at a shared per-tree origin (the "com frame")

All functions are pure jnp, broadcast over leading batch dims, and safe under
jit/vmap (no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def mul_quat(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u*v for (..., 4) quaternions."""
    uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            uw * vw - ux * vx - uy * vy - uz * vz,
            uw * vx + ux * vw + uy * vz - uz * vy,
            uw * vy - ux * vz + uy * vw + uz * vx,
            uw * vz + ux * vy - uy * vx + uz * vw,
        ],
        axis=-1,
    )


def neg_quat(q: jax.Array) -> jax.Array:
    """Conjugate (inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize_quat(q: jax.Array) -> jax.Array:
    """Normalize to unit quaternion; maps the zero quaternion to identity.

    Gradient-safe at q = 0: the norm is computed on a where-guarded operand so
    reverse-mode autodiff through the untaken branch stays finite (the
    double-where pattern; a bare norm(0) has a NaN vjp)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    good = n2 > 1e-24
    norm = jnp.sqrt(jnp.where(good, n2, 1.0))
    unit = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(good, q / norm, unit)


def rotate(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotate (..., 3) vec by (..., 4) quat: R(q) @ vec."""
    w = quat[..., :1]
    u = quat[..., 1:]
    c = jnp.cross(u, vec)
    return vec + 2.0 * (w * c + jnp.cross(u, c))


def rotate_inv(vec: jax.Array, quat: jax.Array) -> jax.Array:
    """Rotate vec by the inverse of quat: R(q)^T @ vec."""
    return rotate(vec, neg_quat(quat))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) unit quaternion (branch-free)."""
    # Shepperd's method, rewritten with where-selection so it is vmap/jit safe.
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # q components via the four standard branches
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0  # 4*qw
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0  # 4*qx
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0  # 4*qy
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0  # 4*qz
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return normalize_quat(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis (..., 3) + angle (...) -> quaternion."""
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by local-frame angular velocity omega over dt.

    Matches MuJoCo ``mju_quatIntegrate``: q <- q * exp(omega * dt / 2) where
    omega is expressed in the child (local) frame. Branch-free small-angle form.
    """
    # gradient-safe small-angle form: axis*sin(theta/2) = omega*dt*sinc-like
    # factor, with the norm taken on a where-guarded operand so autodiff at
    # omega = 0 stays finite (double-where pattern)
    t2 = jnp.sum(omega * omega, axis=-1, keepdims=True) * (dt * dt)
    good = t2 > 1e-24
    theta = jnp.sqrt(jnp.where(good, t2, 1.0))
    half = 0.5 * theta
    # sin(theta/2)/theta, with its Taylor series 1/2 - theta^2/48 at 0
    sinc_half = jnp.where(good, jnp.sin(half) / theta, 0.5 - t2 / 48.0)
    cos_half = jnp.where(good, jnp.cos(half), 1.0 - t2 / 8.0)
    dq = jnp.concatenate([cos_half, omega * dt * sinc_half], axis=-1)
    return normalize_quat(mul_quat(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Velocity-space difference of two quaternions: 3-vector v with
    qa = qb * exp(v/2) (local frame), matching MuJoCo mju_subQuat."""
    dq = mul_quat(neg_quat(qb), qa)
    dq = jnp.where(dq[..., :1] < 0, -dq, dq)  # shortest arc
    # gradient-safe at dq = identity (double-where on the vector norm): the
    # small-angle branch v = 2*dq_vec has the exact limit derivative
    s2 = jnp.sum(dq[..., 1:] * dq[..., 1:], axis=-1, keepdims=True)
    good = s2 > 1e-24
    sin_half = jnp.sqrt(jnp.where(good, s2, 1.0))
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], dq[..., 0])[..., None]
    axis = dq[..., 1:] / sin_half
    return jnp.where(good, axis * angle, 2.0 * dq[..., 1:])


# ---------------------------------------------------------------------------
# Small linear algebra helpers
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix S(v) with S(v) @ x = v × x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Spatial (Plücker) algebra: vectors are (..., 6) = (angular, linear)
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v ×_m m (crm)."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    ang = jnp.cross(vang, mang)
    lin = jnp.cross(vlin, mang) + jnp.cross(vang, mlin)
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v ×_f f (crf): dual of motion_cross."""
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    ang = jnp.cross(vang, fang) + jnp.cross(vlin, flin)
    lin = jnp.cross(vang, flin)
    return jnp.concatenate([ang, lin], axis=-1)


def spatial_inertia(mass: jax.Array, inertia_world: jax.Array, com_offset: jax.Array) -> jax.Array:
    """Build (..., 6, 6) spatial inertia about a frame origin.

    Args:
      mass: (...) body mass.
      inertia_world: (..., 3, 3) rotational inertia about the body COM,
        expressed in world axes.
      com_offset: (..., 3) vector from the frame origin to the body COM.

    With ordering (angular, linear):
        I = [[ I_c + m S(r) S(r)^T ,  m S(r) ],
             [ m S(r)^T            ,  m E    ]]
    """
    r = com_offset
    sr = skew(r)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=sr.dtype), sr.shape)
    top_left = inertia_world + m * (sr @ jnp.swapaxes(sr, -1, -2))
    top_right = m * sr
    bot_left = m * jnp.swapaxes(sr, -1, -2)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_motion(vec: jax.Array, offset: jax.Array) -> jax.Array:
    """Shift the origin of a spatial motion vector by `offset` (new = old + offset)."""
    ang, lin = vec[..., :3], vec[..., 3:]
    return jnp.concatenate([ang, lin + jnp.cross(ang, offset)], axis=-1)
