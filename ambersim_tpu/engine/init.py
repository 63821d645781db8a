"""Data allocation (mirrors mjx.make_data used at reference
ambersim/utils/io_utils.py:226, ambersim/trajopt/shooting.py:34)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ambersim_tpu.core.types import Contact, Data, Model


def _pyr_sizes(s) -> tuple[int, int]:
    """(ncon3, ndiag) when the efc rows factor (sizes Data.efc_bJ/efc_dsc);
    (0, 0) when the model doesn't qualify."""
    from ambersim_tpu.engine.constraint import _pyramid_structure

    st = _pyramid_structure(s)
    return (st.ncon3, st.ndiag) if st is not None else (0, 0)


def make_data(m: Model, dtype=jnp.float32, keyframe=None) -> Data:
    """Allocate a fresh single-env Data at qpos0, zero velocity.

    keyframe: optional <keyframe><key> to reset into instead — name (str) or
    index (int); sets qpos/qvel/act/ctrl/time/mocap from the model's key_*
    fields (the mj_resetDataKeyframe role)."""
    s = m.skel
    z = lambda *shape: jnp.zeros(shape, dtype)  # noqa: E731
    ncon3, ndiag = _pyr_sizes(s)
    mocap_ids = np.asarray(s.mocap_bodyid, np.int32)
    if isinstance(keyframe, str):
        names = list(getattr(s, "key_names", ()))
        if keyframe not in names:
            raise KeyError(f"no keyframe named '{keyframe}' (have {names})")
        keyframe = names.index(keyframe)
    contact = Contact(
        dist=jnp.full((s.ncon,), 1e10, dtype),
        pos=z(s.ncon, 3),
        frame=jnp.tile(jnp.eye(3, dtype=dtype), (s.ncon, 1, 1)),
        friction=z(s.ncon, 5),
        solref=z(s.ncon, 2),
        solimp=z(s.ncon, 5),
        includemargin=z(s.ncon),
        gap=z(s.ncon),
        geom1=jnp.asarray(s.con_geom1[: s.ncon], jnp.int32),
        geom2=jnp.asarray(s.con_geom2[: s.ncon], jnp.int32),
    )
    k = keyframe
    return Data(
        time=jnp.zeros((), dtype) if k is None else jnp.asarray(m.key_time[k], dtype),
        qpos=jnp.asarray(m.qpos0 if k is None else m.key_qpos[k], dtype),
        qvel=z(s.nv) if k is None else jnp.asarray(m.key_qvel[k], dtype),
        act=z(s.na) if k is None else jnp.asarray(m.key_act[k], dtype),
        ctrl=z(s.nu) if k is None else jnp.asarray(m.key_ctrl[k], dtype),
        qfrc_applied=z(s.nv),
        xfrc_applied=z(s.nbody, 6),
        qacc_warmstart=z(s.nv),
        mocap_pos=(
            jnp.asarray(m.body_pos, dtype)[mocap_ids] if k is None else jnp.asarray(m.key_mpos[k], dtype)
        ),
        mocap_quat=(
            jnp.asarray(m.body_quat, dtype)[mocap_ids] if k is None else jnp.asarray(m.key_mquat[k], dtype)
        ),
        xpos=z(s.nbody, 3),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (s.nbody, 1)),
        xipos=z(s.nbody, 3),
        ximat=jnp.tile(jnp.eye(3, dtype=dtype), (s.nbody, 1, 1)),
        xanchor=z(s.njnt, 3),
        xaxis=z(s.njnt, 3),
        geom_xpos=z(s.ngeom, 3),
        geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.ngeom, 1, 1)),
        site_xpos=z(s.nsite, 3),
        site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.nsite, 1, 1)),
        cam_xpos=z(s.ncam, 3),
        cam_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (s.ncam, 1, 1)),
        light_xpos=z(s.nlight, 3),
        light_xdir=z(s.nlight, 3),
        ten_length=z(s.ntendon),
        ten_velocity=z(s.ntendon),
        ten_J=z(s.ntendon, s.nv),
        subtree_com=z(s.nbody, 3),
        cinert=z(s.nbody, 6, 6),
        cdof=z(s.nv, 6),
        cdof_dot=z(s.nv, 6),
        cvel=z(s.nbody, 6),
        qM=z(s.nv, s.nv),
        qLD=z(s.nv, s.nv),
        qfrc_bias=z(s.nv),
        qfrc_passive=z(s.nv),
        qfrc_spring=z(s.nv),
        qfrc_damper=z(s.nv),
        actuator_length=z(s.nu),
        actuator_velocity=z(s.nu),
        actuator_force=z(s.nu),
        act_dot=z(s.na),
        qfrc_actuator=z(s.nv),
        qfrc_smooth=z(s.nv),
        qacc_smooth=z(s.nv),
        qfrc_constraint=z(s.nv),
        qacc=z(s.nv),
        qfrc_inverse=z(s.nv),
        contact=contact,
        efc_J=z(s.nefc, s.nv),
        efc_bJ=z(3 * ncon3, s.nv),
        efc_dsc=z(ndiag),
        efc_D=z(s.nefc),
        efc_aref=z(s.nefc),
        efc_pos=z(s.nefc),
        efc_margin=z(s.nefc),
        efc_frictionloss=z(s.nefc),
        efc_active=jnp.zeros((s.nefc,), bool),
        efc_force=z(s.nefc),
        cacc=z(s.nbody, 6),
        sensordata=z(s.nsensordata),
        energy=z(2),
        solver_fwdinv=z(2),
    )
