"""Sensor parity vs the MuJoCo C oracle (engine/sensor.py).

Covers every supported mjtSensor type row-by-row: pos-stage (joint/actuator/
frame/subtree/energy/magnetometer/clock), vel-stage (velocimeter/gyro/frame
velocities/subtree momentum), and acc-stage (accelerometer, frame
accelerations, touch, force, torque, actuator forces, joint-limit rows).
Reference exposure: sensors ride mjx.Data.sensordata through the reference's
pipeline (ambersim/rl/base.py:93).
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string
import pytest

SENSOR_RIG = """
<mujoco model="sensor_rig">
  <option timestep="0.002" magnetic="0.3 -0.4 0.2"/>
  <worldbody>
    <body name="base" pos="0 0 1.0">
      <joint name="slide" type="slide" axis="1 0 0" damping="0.2"/>
      <geom name="base_box" type="box" size="0.1 0.08 0.05" density="600"/>
      <site name="imu" pos="0.02 0.01 0.05" euler="0 20 10" size="0.01"/>
      <body name="arm" pos="0 0 0.1" euler="0 10 0">
        <joint name="swing" axis="0 1 0" range="-1.0 1.0" stiffness="2" springref="0.3" damping="0.05"/>
        <geom name="arm_cap" type="capsule" fromto="0 0 0 0 0 0.4" size="0.03"/>
        <site name="tip" pos="0 0 0.4" size="0.01"/>
        <body name="wrist" pos="0 0 0.4">
          <joint name="wrist_ball" type="ball" damping="0.01"/>
          <geom name="wrist_geom" type="sphere" size="0.05" density="900" pos="0.04 0 0.02"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="slide_m" joint="slide" gear="2"/>
    <motor name="swing_m" joint="swing"/>
  </actuator>
  <sensor>
    <clock name="clk"/>
    <jointpos name="jp" joint="swing"/>
    <jointvel name="jv" joint="swing"/>
    <ballquat name="bq" joint="wrist_ball"/>
    <ballangvel name="bav" joint="wrist_ball"/>
    <actuatorpos name="ap" actuator="slide_m"/>
    <actuatorvel name="av" actuator="swing_m"/>
    <actuatorfrc name="af" actuator="slide_m"/>
    <jointactuatorfrc name="jaf" joint="swing"/>
    <magnetometer name="mag" site="imu"/>
    <velocimeter name="velo" site="imu"/>
    <gyro name="gyr" site="imu"/>
    <accelerometer name="acc" site="imu"/>
    <framepos name="fp_site" objtype="site" objname="tip"/>
    <framepos name="fp_body" objtype="body" objname="wrist"/>
    <framepos name="fp_xbody" objtype="xbody" objname="wrist"/>
    <framepos name="fp_geom" objtype="geom" objname="wrist_geom"/>
    <framepos name="fp_ref" objtype="site" objname="tip" reftype="site" refname="imu"/>
    <framequat name="fq" objtype="xbody" objname="arm"/>
    <framequat name="fq_ref" objtype="site" objname="tip" reftype="site" refname="imu"/>
    <framexaxis name="fx" objtype="site" objname="tip"/>
    <frameyaxis name="fy" objtype="site" objname="tip"/>
    <framezaxis name="fz" objtype="site" objname="tip" reftype="site" refname="imu"/>
    <framelinvel name="flv" objtype="site" objname="tip"/>
    <framelinvel name="flv_ref" objtype="site" objname="tip" reftype="site" refname="imu"/>
    <frameangvel name="fav" objtype="xbody" objname="wrist"/>
    <frameangvel name="fav_ref" objtype="xbody" objname="wrist" reftype="site" refname="imu"/>
    <framelinacc name="fla" objtype="site" objname="tip"/>
    <frameangacc name="faa" objtype="xbody" objname="wrist"/>
    <subtreecom name="scom" body="arm"/>
    <subtreelinvel name="slv" body="arm"/>
    <subtreeangmom name="sam" body="arm"/>
    <e_potential name="ep"/>
    <e_kinetic name="ek"/>
  </sensor>
</mujoco>
"""

CONTACT_RIG = """
<mujoco model="contact_rig">
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="brick" pos="0 0 0.08">
      <freejoint/>
      <geom name="brick_geom" type="box" size="0.1 0.08 0.06" density="500"/>
      <site name="belly" pos="0 0 -0.05" type="box" size="0.15 0.12 0.03"/>
      <site name="ft" pos="0 0 0" size="0.01"/>
    </body>
    <body name="pend" pos="1 0 0.5">
      <joint name="lim_hinge" axis="0 1 0" range="-0.2 0.2" damping="0.05"/>
      <geom name="pend_cap" type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/>
    </body>
  </worldbody>
  <sensor>
    <touch name="touch" site="belly"/>
    <force name="force" site="ft"/>
    <torque name="torque" site="ft"/>
    <accelerometer name="acc" site="ft"/>
    <jointlimitpos name="jlp" joint="lim_hinge"/>
    <jointlimitvel name="jlv" joint="lim_hinge"/>
    <jointlimitfrc name="jlf" joint="lim_hinge"/>
  </sensor>
</mujoco>
"""


def _load_pair(xml):
    from ambersim_tpu.engine.setconst import set_constants

    mj_model = mujoco.MjModel.from_xml_string(xml)
    spec = parse_mjcf_string(xml)
    model = set_constants(compile_spec(spec))
    return mj_model, model


def _sensor_slices(mj_model):
    out = {}
    for i in range(mj_model.nsensor):
        name = mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_SENSOR, i)
        adr, dim = mj_model.sensor_adr[i], mj_model.sensor_dim[i]
        out[name] = slice(adr, adr + dim)
    return out


def test_sensor_layout_matches_mujoco():
    mj_model, model = _load_pair(SENSOR_RIG)
    s = model.skel
    assert s.nsensor == mj_model.nsensor
    assert s.nsensordata == mj_model.nsensordata
    np.testing.assert_array_equal(s.sensor_adr, mj_model.sensor_adr)
    np.testing.assert_array_equal(s.sensor_dim, mj_model.sensor_dim)
    np.testing.assert_array_equal(s.sensor_type, mj_model.sensor_type.ravel())
    np.testing.assert_array_equal(s.sensor_objid, mj_model.sensor_objid.ravel())
    assert s.nsite == mj_model.nsite
    np.testing.assert_allclose(model.site_pos, mj_model.site_pos, atol=1e-7)


def test_sensor_parity_smooth():
    """All pos/vel/acc sensors on a contact-free rig, random states."""
    mj_model, model = _load_pair(SENSOR_RIG)
    slices = _sensor_slices(mj_model)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(3)

    for trial in range(3):
        qpos = mj_model.qpos0.copy()
        qpos[0] += 0.4 * rng.standard_normal()
        qpos[1] += 0.5 * rng.standard_normal()
        q = rng.standard_normal(4)
        qpos[2:6] = q / np.linalg.norm(q)
        qvel = 0.6 * rng.standard_normal(mj_model.nv)
        ctrl = 0.5 * rng.standard_normal(mj_model.nu)

        mj_data = mujoco.MjData(mj_model)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mj_data.time = 1.25
        mujoco.mj_forward(mj_model, mj_data)

        d = make_data(model)
        d = d.replace(
            qpos=jnp.asarray(qpos, jnp.float32),
            qvel=jnp.asarray(qvel, jnp.float32),
            ctrl=jnp.asarray(ctrl, jnp.float32),
            time=jnp.float32(1.25),
        )
        d = fwd(model, d)
        got = np.asarray(d.sensordata)
        want = mj_data.sensordata

        for name, sl in slices.items():
            g, w = got[sl], want[sl]
            if name.startswith("fq") or name == "bq":  # quats match up to sign
                if np.dot(g, w) < 0:
                    g = -g
            tol = 2e-3 if name in ("acc", "fla", "faa", "af", "jaf") else 2e-4
            np.testing.assert_allclose(g, w, rtol=1e-3, atol=tol, err_msg=f"sensor {name} trial {trial}")


@pytest.mark.slow
def test_sensor_parity_contacts():
    """Touch / force / torque / joint-limit sensors at contact steady state."""
    mj_model, model = _load_pair(CONTACT_RIG)
    slices = _sensor_slices(mj_model)

    mj_data = mujoco.MjData(mj_model)
    d = make_data(model)
    stp = jax.jit(step)
    for _ in range(200):
        mujoco.mj_step(mj_model, mj_data)
    for _ in range(200):
        d = stp(model, d)

    got = np.asarray(d.sensordata)
    want = mj_data.sensordata

    # brick at rest: touch reads total normal force ~= m g; force sensor reads
    # the joint interaction force on the free body (gravity reaction)
    mg = float((500 * 0.2 * 0.16 * 0.12) * 9.81)
    assert abs(want[slices["touch"]][0] - mg) / mg < 0.05  # oracle sanity
    np.testing.assert_allclose(got[slices["touch"]], want[slices["touch"]], rtol=0.02, atol=0.05)
    np.testing.assert_allclose(got[slices["force"]], want[slices["force"]], rtol=0.02, atol=0.05)
    np.testing.assert_allclose(got[slices["torque"]], want[slices["torque"]], rtol=0.05, atol=0.05)
    np.testing.assert_allclose(got[slices["acc"]], want[slices["acc"]], rtol=0.02, atol=0.05)
    # pendulum rests on its limit
    assert abs(want[slices["jlf"]][0]) > 1e-3
    np.testing.assert_allclose(got[slices["jlp"]], want[slices["jlp"]], atol=2e-4)
    np.testing.assert_allclose(got[slices["jlv"]], want[slices["jlv"]], atol=2e-3)
    np.testing.assert_allclose(got[slices["jlf"]], want[slices["jlf"]], rtol=0.05, atol=0.02)


def test_sensordata_in_rollout():
    """sensordata stays finite and is refreshed every step under scan."""
    _, model = _load_pair(SENSOR_RIG)
    d = make_data(model)

    def body(d, _):
        d = step(model, d)
        return d, d.sensordata

    _, traj = jax.lax.scan(body, d, None, length=10)
    assert np.isfinite(np.asarray(traj)).all()
    assert not np.allclose(traj[0], traj[-1])


CAM_INSIDE_RIG = """
<mujoco model="cam_inside_rig">
  <option timestep="0.002"/>
  <worldbody>
    <site name="zone_box" type="box" size="0.5 0.4 0.3" pos="0 0 1" euler="0 0 20"/>
    <site name="zone_sph" type="sphere" size="0.25" pos="0.2 0 1"/>
    <body name="rig" pos="0.1 0.2 0.3" euler="10 20 30">
      <joint name="h" type="hinge" axis="0 0 1"/>
      <geom type="sphere" size="0.05" density="800"/>
      <camera name="cam_fovy" pos="0.3 -0.2 0.5" euler="15 25 5" fovy="60" resolution="640 480"/>
      <camera name="cam_intr" pos="-0.1 0.4 0.2" euler="80 10 -30" resolution="1280 720"
              sensorsize="0.036 0.024" focal="0.05 0.04"/>
      <camera name="cam_fpix" pos="0 0 0.6" euler="5 -10 40" resolution="320 240"
              sensorsize="0.012 0.009" focalpixel="300 300" principalpixel="4 -2"/>
    </body>
    <body name="probe" pos="0.25 0.1 0.95">
      <freejoint/>
      <geom name="probe_geom" type="sphere" size="0.02" density="1000" pos="0.01 0 0.02"/>
      <site name="probe_site" pos="0.01 0.02 0.03"/>
    </body>
    <body name="winch" pos="1 0 1">
      <joint name="w" type="slide" axis="0 0 1" damping="1"/>
      <geom type="box" size="0.05 0.05 0.05" density="500"/>
      <site name="w_site" pos="0 0 0.1"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="cable">
      <site site="probe_site"/>
      <site site="w_site"/>
    </spatial>
  </tendon>
  <actuator>
    <motor name="cable_m1" tendon="cable" gear="1.5"/>
    <motor name="cable_m2" tendon="cable" gear="-0.5"/>
    <motor name="hinge_m" joint="h"/>
  </actuator>
  <sensor>
    <camprojection name="cp1" site="probe_site" camera="cam_fovy"/>
    <camprojection name="cp2" site="probe_site" camera="cam_intr"/>
    <camprojection name="cp3" site="probe_site" camera="cam_fpix"/>
    <insidesite name="in_site" site="zone_box" objtype="site" objname="probe_site"/>
    <insidesite name="in_xbody" site="zone_box" objtype="xbody" objname="probe"/>
    <insidesite name="in_body" site="zone_box" objtype="body" objname="probe"/>
    <insidesite name="in_geom" site="zone_sph" objtype="geom" objname="probe_geom"/>
    <tendonactuatorfrc name="taf" tendon="cable"/>
  </sensor>
</mujoco>
"""


def test_camprojection_insidesite_tendonactfrc_parity():
    """camprojection (fovy + intrinsic + focalpixel cameras), insidesite over
    all objtypes, tendonactfrc (two tendon actuators summed) vs the oracle."""
    mj_model, model = _load_pair(CAM_INSIDE_RIG)
    slices = _sensor_slices(mj_model)
    np.testing.assert_allclose(model.cam_intrinsic, mj_model.cam_intrinsic, atol=1e-6)
    np.testing.assert_allclose(model.cam_resolution, mj_model.cam_resolution, atol=0)
    fwd = jax.jit(forward)
    rng = np.random.default_rng(11)

    hits = 0
    for trial in range(6):
        qpos = mj_model.qpos0.copy()
        qpos[0] += 0.5 * rng.standard_normal()
        qpos[1:4] += 0.3 * rng.standard_normal(3)  # free-body translation
        q = rng.standard_normal(4)
        qpos[4:8] = q / np.linalg.norm(q)
        qpos[8] += 0.3 * rng.standard_normal()
        qvel = 0.3 * rng.standard_normal(mj_model.nv)
        ctrl = rng.standard_normal(mj_model.nu)

        mj_data = mujoco.MjData(mj_model)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, mj_data)

        d = make_data(model)
        d = d.replace(
            qpos=jnp.asarray(qpos, jnp.float32),
            qvel=jnp.asarray(qvel, jnp.float32),
            ctrl=jnp.asarray(ctrl, jnp.float32),
        )
        d = fwd(model, d)
        got = np.asarray(d.sensordata)
        want = mj_data.sensordata

        for name in ("cp1", "cp2", "cp3"):
            w = want[slices[name]]
            # pixel coords can be huge near the focal plane; compare w/ rtol
            np.testing.assert_allclose(
                got[slices[name]], w, rtol=2e-3, atol=0.5, err_msg=f"{name} trial {trial}"
            )
        for name in ("in_site", "in_xbody", "in_body", "in_geom"):
            np.testing.assert_array_equal(
                got[slices[name]], want[slices[name]], err_msg=f"{name} trial {trial}"
            )
            hits += int(want[slices[name]][0])
        np.testing.assert_allclose(
            got[slices["taf"]], want[slices["taf"]], rtol=1e-4, atol=1e-5, err_msg=f"taf trial {trial}"
        )
    assert hits > 0  # at least one inside hit across trials (test is not vacuous)
