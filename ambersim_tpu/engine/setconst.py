"""Compile-time derived constants: invweight0 (mirrors mj_setConst).

Run once on host after compilation; uses the engine itself at qpos0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Model
from ambersim_tpu.engine import smooth
from ambersim_tpu.engine.init import make_data


def set_constants(model: Model) -> Model:
    s = model.skel
    if s.nv == 0:
        return model
    d = make_data(model)
    d = smooth.fwd_position_smooth(model, d)
    minv = jnp.linalg.inv(d.qM)
    dof_invweight0 = jnp.diag(minv)

    # body invweight0: mean diagonal of J M^-1 J^T for com translation/rotation
    supports = smooth._body_dof_support(s)  # (nbody, nv)
    origin = d.subtree_com[s.body_rootid]
    body_inv = np.zeros((s.nbody, 2), dtype=np.float32)
    cdof = np.asarray(d.cdof)
    minv_np = np.asarray(minv)
    xipos = np.asarray(d.xipos)
    origin_np = np.asarray(origin)
    for b in range(1, s.nbody):
        # 6 x nv jacobian of body com (rotation; translation at xipos)
        jac = np.zeros((6, s.nv))
        offset = xipos[b] - origin_np[b]
        for v in range(s.nv):
            if not supports[b, v]:
                continue
            ang = cdof[v, :3]
            lin = cdof[v, 3:] + np.cross(ang, offset)
            jac[:3, v] = ang
            jac[3:, v] = lin
        a = jac @ minv_np @ jac.T
        body_inv[b, 0] = (a[3, 3] + a[4, 4] + a[5, 5]) / 3.0  # translation
        body_inv[b, 1] = (a[0, 0] + a[1, 1] + a[2, 2]) / 3.0  # rotation
    return model.replace(
        dof_invweight0=jnp.asarray(dof_invweight0, jnp.float32),
        body_invweight0=jnp.asarray(body_inv),
    )
