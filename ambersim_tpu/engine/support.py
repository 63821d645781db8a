"""Support functions: Jacobians, mass-matrix products, Cartesian force
mapping (roles of mj_jac*, mj_mulM, mj_applyFT / mjx.support — consumed by
operational-space controllers on top of the env API, cf. reference
ambersim/rl/base.py's exposure of the raw physics state).

Conventions: `point` is world-frame (3,); body/site/geom ids are static
Python ints (they index compile-time tree structure); Jacobians are
(nv, 3) — the transpose of MuJoCo's C layout: `jacp.T @ qvel` gives the
point's world velocity, `jacp @ force` maps a world force to qfrc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import Data, Model
from ambersim_tpu.engine.smooth import _body_dof_support


def jac(m: Model, d: Data, point: jax.Array, bodyid: int):
    """Kinematic Jacobian of a world-frame `point` attached to body `bodyid`.

    Returns `(jacp, jacr)`, each (nv, 3): `jacp.T @ qvel` is the point's
    world linear velocity, `jacr.T @ qvel` its angular velocity (mj_jac
    semantics, transposed layout).
    """
    s = m.skel
    dtype = d.qpos.dtype
    mask = jnp.asarray(_body_dof_support(s)[bodyid], dtype)[:, None]  # (nv, 1)
    offset = point - d.subtree_com[s.body_rootid[bodyid]]
    ang = d.cdof[:, :3]
    lin = d.cdof[:, 3:] + jnp.cross(ang, offset[None, :])
    return lin * mask, ang * mask


def jac_body(m: Model, d: Data, bodyid: int):
    """Jacobian of the body frame origin (mj_jacBody)."""
    return jac(m, d, d.xpos[bodyid], bodyid)


def jac_body_com(m: Model, d: Data, bodyid: int):
    """Jacobian of the body center of mass (mj_jacBodyCom)."""
    return jac(m, d, d.xipos[bodyid], bodyid)


def jac_site(m: Model, d: Data, siteid: int):
    """Jacobian of a site (mj_jacSite)."""
    return jac(m, d, d.site_xpos[siteid], int(m.skel.site_bodyid[siteid]))


def jac_geom(m: Model, d: Data, geomid: int):
    """Jacobian of a geom frame origin (mj_jacGeom)."""
    return jac(m, d, d.geom_xpos[geomid], int(m.skel.geom_bodyid[geomid]))


def full_m(m: Model, d: Data) -> jax.Array:
    """Dense joint-space inertia matrix (mj_fullM; already dense here)."""
    return d.qM


def mul_m(m: Model, d: Data, vec: jax.Array) -> jax.Array:
    """qM @ vec (mj_mulM)."""
    return d.qM @ vec


def apply_ft(m: Model, d: Data, force: jax.Array, torque: jax.Array, point: jax.Array, bodyid: int) -> jax.Array:
    """Map a world-frame force/torque applied at `point` on body `bodyid` to
    generalized forces (mj_applyFT's qfrc_target contribution)."""
    jacp, jacr = jac(m, d, point, bodyid)
    return jacp @ force + jacr @ torque
