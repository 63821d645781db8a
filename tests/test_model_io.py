"""Model I/O tests (strategy mirrors reference tests/test_model_io.py:23-146:
path styles, URDF actuator/mimic synthesis invariants, force_float surgery)."""

import glob
import os
import shutil
from pathlib import Path

import numpy as np
import pytest

from ambersim_tpu import ROOT
from ambersim_tpu.utils.introspection_utils import (
    get_actuator_names,
    get_equality_names,
    get_joint_names,
)
from ambersim_tpu.utils.io_utils import load_model_and_data_from_file, load_model_from_file

GRIPPER_URDF = """<?xml version="1.0"?>
<robot name="gripper">
  <link name="palm">
    <inertial><mass value="0.5"/><origin xyz="0 0 0"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/></inertial>
    <collision><geometry><box size="0.08 0.04 0.02"/></geometry></collision>
  </link>
  <link name="finger1">
    <inertial><mass value="0.1"/><origin xyz="0 0 0.02"/>
      <inertia ixx="0.0001" ixy="0" ixz="0" iyy="0.0001" iyz="0" izz="0.0001"/></inertial>
    <collision><geometry><capsule radius="0.008" length="0.04"/></geometry></collision>
  </link>
  <link name="finger2">
    <inertial><mass value="0.1"/><origin xyz="0 0 0.02"/>
      <inertia ixx="0.0001" ixy="0" ixz="0" iyy="0.0001" iyz="0" izz="0.0001"/></inertial>
    <collision><geometry><capsule radius="0.008" length="0.04"/></geometry></collision>
  </link>
  <joint name="finger1_joint" type="revolute">
    <parent link="palm"/><child link="finger1"/>
    <origin xyz="0.04 0 0.01"/><axis xyz="0 1 0"/>
    <limit effort="1.5" lower="0" upper="1.2"/>
  </joint>
  <joint name="finger2_joint" type="revolute">
    <parent link="palm"/><child link="finger2"/>
    <origin xyz="-0.04 0 0.01"/><axis xyz="0 -1 0"/>
    <limit effort="1.5" lower="0" upper="1.2"/>
    <mimic joint="finger1_joint" multiplier="0.5" offset="0.1"/>
  </joint>
  <transmission name="t1"><type>x</type><joint name="finger1_joint"/>
    <actuator name="finger1_act"/></transmission>
</robot>
"""


def test_load_model_path_styles(tmp_path):
    """str/Path x global/local/repo-root resolution (cf. reference
    test_model_io.py:23-46)."""
    global_path = os.path.join(ROOT, "models/pendulum/pendulum.xml")
    for p in (global_path, Path(global_path), "models/pendulum/pendulum.xml"):
        model = load_model_from_file(p)
        assert model.nq == 1 and model.nu == 1

    local = tmp_path / "pendulum_copy.xml"
    shutil.copy(global_path, local)
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        model = load_model_from_file("pendulum_copy.xml")
        assert model.nq == 1
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_all_packaged_models():
    """Every packaged XML/URDF loads, with and without force_float
    (cf. reference test_model_io.py:49-54)."""
    files = glob.glob(os.path.join(ROOT, "models", "**", "*.xml"), recursive=True)
    files += glob.glob(os.path.join(ROOT, "models", "**", "*.urdf"), recursive=True)
    assert files
    for f in files:
        load_model_from_file(f)
        load_model_from_file(f, force_float=True)


def test_urdf_actuator_synthesis():
    """#transmissions == nu with effort-limit ctrlrange (cf. reference
    test_model_io.py:65-84)."""
    model = load_model_from_file(os.path.join(ROOT, "models/pendulum/pendulum.urdf"))
    assert model.nu == 1
    assert get_actuator_names(model) == ["pendulum_joint_actuator"]
    np.testing.assert_allclose(model.actuator_ctrlrange[0], [-2.0, 2.0])
    assert model.skel.actuator_ctrllimited[0]


def test_urdf_mimic_synthesis(tmp_path):
    """#mimic tags == neq with polycoef coupling (cf. reference
    test_model_io.py:87-107)."""
    p = tmp_path / "gripper.urdf"
    p.write_text(GRIPPER_URDF)
    model = load_model_from_file(p)
    assert model.neq == 1
    assert get_equality_names(model) == ["finger2_joint_mimic"]
    # residual: q_finger2 - (offset + multiplier * q_finger1)
    np.testing.assert_allclose(model.eq_data[0, :2], [0.1, 0.5])
    assert get_joint_names(model) == ["finger1_joint", "finger2_joint"]
    assert model.nu == 1


def test_force_float():
    """force_float adds a freejoint: nq 1 -> 8, quat initialized
    (cf. reference test_model_io.py:110-146)."""
    model = load_model_from_file("models/pendulum/pendulum.xml", force_float=True)
    assert model.nq == 8 and model.nv == 7
    np.testing.assert_allclose(np.asarray(model.qpos0[3:7]), [1, 0, 0, 0], atol=1e-6)
    model2, data2 = load_model_and_data_from_file("models/pendulum/pendulum.urdf", force_float=True)
    assert model2.nq == 8
    assert data2.qpos.shape == (8,)


@pytest.mark.slow
def test_urdf_matches_mjcf_dynamics():
    """URDF- and MJCF-compiled pendulums produce the same physics."""
    import jax
    import jax.numpy as jnp

    from ambersim_tpu.engine import make_data, step

    m_xml = load_model_from_file("models/pendulum/pendulum.xml")
    m_urdf = load_model_from_file("models/pendulum/pendulum.urdf")
    # the XML sets custom solver iterations; align the URDF model
    m_urdf = m_urdf.replace(
        opt=m_urdf.opt.replace(iterations=m_xml.opt.iterations, ls_iterations=m_xml.opt.ls_iterations)
    )
    m_urdf = m_urdf.replace(opt=m_urdf.opt.replace(timestep=m_xml.opt.timestep))

    def roll(m):
        d = make_data(m).replace(qpos=jnp.array([1.2]), ctrl=jnp.array([0.8]))
        stepper = jax.jit(step)
        for _ in range(50):
            d = stepper(m, d)
        return np.asarray(d.qpos)

    np.testing.assert_allclose(roll(m_xml), roll(m_urdf), atol=2e-4)


def test_cone_loader_override():
    """cone= must act at COMPILE time: the static efc layout encodes the
    cone (k rows/contact elliptic vs 2(k-1) pyramidal); flipping opt.cone on
    a compiled Model is rejected by the solver instead of silently reading
    wrong rows."""
    import pytest

    from ambersim_tpu.core.types import ConeType
    from ambersim_tpu.utils.io_utils import load_model_from_file

    m_p = load_model_from_file("models/quadruped/quadruped.xml")
    m_e = load_model_from_file("models/quadruped/quadruped.xml", cone="elliptic")
    assert int(m_e.opt.cone) == int(ConeType.ELLIPTIC)
    assert m_e.skel.nefc < m_p.skel.nefc  # 3 vs 4 rows per condim-3 contact

    from ambersim_tpu.engine.solver import _elliptic_meta

    (cdim, slots, rows, base, full) = _elliptic_meta(m_e.skel)[0]
    assert base is not None and full  # contiguous-tail fast path engaged

    with pytest.raises(ValueError, match="not\\s+elliptic|recompile"):
        _elliptic_meta(m_p.skel)

    with pytest.raises(ValueError, match="cone must be"):
        load_model_from_file("models/quadruped/quadruped.xml", cone="banana")
