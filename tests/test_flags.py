"""Option flag semantics parity vs the MuJoCo C engine: the MuJoCo >= 3.9
spring/damper disable split (mjDSBL_SPRING/mjDSBL_DAMPER and their effect on
fluid/gravcomp and implicit integration), contact-parameter override
(mjENBL_OVERRIDE + o_margin/o_solref/o_solimp/o_friction), energy accounting
(mjENBL_ENERGY -> Data.energy), and the forward/inverse consistency check
(mjENBL_FWDINV -> Data.solver_fwdinv).

Reference role: the mjOption flag surface the reference drives through the C
engine (cf. reference ambersim/utils/io_utils.py solver-option overrides)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ambersim_tpu.core.types import DisableBit, EnableBit
from ambersim_tpu.engine import forward, make_data, step
from ambersim_tpu.mjcf import compile_spec
from ambersim_tpu.mjcf.parser import parse_mjcf_string

PASSIVE_RICH = """
<mujoco>
  <option timestep="0.004" density="1.2" viscosity="0.1" wind="1 0 0"
          integrator="{integrator}">
    <flag {flags}/>
  </option>
  <worldbody>
    <body pos="0 0 1" gravcomp="0.5">
      <joint name="j" type="hinge" axis="0 1 0" stiffness="10" damping="2"
             springref="0.3"/>
      <geom type="capsule" size="0.05 0.2" pos="0.25 0 0" euler="0 90 0"/>
      <body pos="0.5 0 0">
        <joint name="b" type="ball" stiffness="4" damping="0.5"/>
        <geom type="sphere" size="0.06"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t" stiffness="5" damping="0.7" springlength="0.1 0.2">
      <joint joint="j" coef="1"/>
    </fixed>
  </tendon>
</mujoco>
"""


def _pair(xml):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return mj_model, model


def _rich(integrator="Euler", flags=""):
    return PASSIVE_RICH.format(integrator=integrator, flags=flags or 'energy="enable"')


@pytest.mark.parametrize(
    "flags",
    ['spring="disable"', 'damper="disable"', 'spring="disable" damper="disable"'],
)
def test_spring_damper_disable_forces(flags):
    """SPRING/DAMPER zero their own term; both set -> fluid and gravcomp are
    skipped too (mj_passive early exit)."""
    xml = _rich(flags=flags)
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[0] = 0.5
    mj_data.qvel[:] = np.linspace(0.2, 1.0, mj_model.nv)
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(
        qpos=d.qpos.at[0].set(0.5),
        qvel=jnp.linspace(0.2, 1.0, model.skel.nv),
    )
    d = jax.jit(forward)(model, d)

    np.testing.assert_allclose(d.qfrc_spring, mj_data.qfrc_spring, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d.qfrc_damper, mj_data.qfrc_damper, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d.qfrc_passive, mj_data.qfrc_passive, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-3)


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
def test_damper_disable_kills_implicit_lhs(integrator):
    """With DAMPER disabled the implicit-in-velocity damping term vanishes
    from the integrator LHS as well (oracle: qvel passes through unchanged in
    a gravity-free, force-free model)."""
    xml = _rich(integrator=integrator, flags='damper="disable" gravity="disable"')
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[:] = np.linspace(0.2, 1.0, mj_model.nv)
    mujoco.mj_step(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(qvel=jnp.linspace(0.2, 1.0, model.skel.nv))
    d = jax.jit(step)(model, d)

    np.testing.assert_allclose(d.qvel, mj_data.qvel, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, rtol=1e-4, atol=1e-5)


def test_passive_alias_equals_spring_plus_damper():
    """The pre-3.9 'passive' flag this framework still accepts maps to
    SPRING|DAMPER (the oracle's schema no longer has it, so engine-only)."""
    xml_alias = _rich(flags='passive="disable"')
    xml_split = _rich(flags='spring="disable" damper="disable"')
    _, m_alias = _pair_engine_only(xml_alias)
    _, m_split = _pair_engine_only(xml_split)
    assert m_alias.opt.disableflags == m_split.opt.disableflags

    d = make_data(m_alias)
    d = d.replace(qpos=d.qpos.at[0].set(0.5), qvel=jnp.ones(m_alias.skel.nv) * 0.3)
    d = jax.jit(forward)(m_alias, d)
    np.testing.assert_array_equal(np.asarray(d.qfrc_passive), 0.0)


def _pair_engine_only(xml):
    from ambersim_tpu.engine.setconst import set_constants

    model = set_constants(compile_spec(parse_mjcf_string(xml)))
    return None, model


OVERRIDE_SCENE = """
<mujoco>
  <option timestep="0.002" o_margin="0.02" o_solref="0.05 0.8"
          o_solimp="0.5 0.6 0.002 0.4 3" o_friction="0.3 0.3 0.002 0.01 0.01">
    <flag {flag}/>
  </option>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1"/>
    <body pos="0 0 0.049">
      <freejoint/>
      <geom type="sphere" size="0.05" friction="1 0.005 0.0001" margin="0.001"
            gap="0.0005" solref="0.02 1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_override_contact_params():
    """mjENBL_OVERRIDE replaces contact friction/solref/solimp wholesale and
    sets includemargin = o_margin (gap ignored); efc rows match the oracle."""
    xml = OVERRIDE_SCENE.format(flag='override="enable"')
    mj_model, model = _pair(xml)
    assert model.opt.enableflags & EnableBit.OVERRIDE
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[0] = 0.2
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = d.replace(qvel=d.qvel.at[0].set(0.2))
    d = jax.jit(forward)(model, d)

    assert mj_data.ncon == 1
    c = mj_data.contact[0]
    np.testing.assert_allclose(d.contact.includemargin[:1], [c.includemargin], atol=1e-7)
    np.testing.assert_allclose(d.contact.friction[0], c.friction, atol=1e-7)
    np.testing.assert_allclose(d.contact.solref[0], c.solref, atol=1e-7)
    np.testing.assert_allclose(d.contact.solimp[0], c.solimp, atol=1e-7)
    np.testing.assert_allclose(1.0 / d.efc_D, mj_data.efc_R, rtol=1e-4)
    np.testing.assert_allclose(d.efc_aref, mj_data.efc_aref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(d.qacc, mj_data.qacc, rtol=5e-3, atol=1e-3)


def test_override_rollout_parity():
    xml = OVERRIDE_SCENE.format(flag='override="enable"')
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qvel[0] = 0.5

    d = make_data(model)
    d = d.replace(qvel=d.qvel.at[0].set(0.5))
    stepj = jax.jit(step)
    for _ in range(25):
        mujoco.mj_step(mj_model, mj_data)
        d = stepj(model, d)
    np.testing.assert_allclose(d.qpos, mj_data.qpos, rtol=2e-3, atol=2e-4)


def test_override_flag_off_keeps_geom_params():
    """With the flag off, o_* attributes present in XML must have no effect."""
    xml = OVERRIDE_SCENE.format(flag='energy="enable"')
    mj_model, model = _pair(xml)
    assert not (model.opt.enableflags & EnableBit.OVERRIDE)
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model)
    d = jax.jit(forward)(model, d)
    c = mj_data.contact[0]
    np.testing.assert_allclose(d.contact.includemargin[:1], [c.includemargin], atol=1e-7)
    np.testing.assert_allclose(d.contact.friction[0], c.friction, atol=1e-7)
    np.testing.assert_allclose(d.contact.solref[0], c.solref, atol=1e-7)


def test_energy_flag():
    """mjENBL_ENERGY populates Data.energy = (potential, kinetic), covering
    gravity + hinge/ball springs + deadband tendon springs, with GRAVITY and
    SPRING disables gating their parts."""
    for flags, check in [
        ('energy="enable"', None),
        ('energy="enable" gravity="disable"', "nograv"),
        ('energy="enable" spring="disable"', "nospring"),
    ]:
        xml = _rich(flags=flags)
        mj_model, model = _pair(xml)
        mj_data = mujoco.MjData(mj_model)
        mj_data.qpos[0] = 0.5
        mj_data.qpos[1:5] = [0.9, 0.3, 0.3, 0.1]
        mj_data.qvel[:] = np.linspace(0.1, 1.0, mj_model.nv)
        mujoco.mj_forward(mj_model, mj_data)

        d = make_data(model, dtype=jnp.float64)
        d = d.replace(
            qpos=d.qpos.at[0].set(0.5).at[1:5].set(jnp.array([0.9, 0.3, 0.3, 0.1])),
            qvel=jnp.linspace(0.1, 1.0, model.skel.nv),
        )
        d = jax.jit(forward)(model, d)
        np.testing.assert_allclose(d.energy, mj_data.energy, rtol=1e-4, atol=1e-7)


def test_energy_sensors_match_flag():
    """E_POTENTIAL/E_KINETIC sensors share the energy_pos/energy_vel helpers
    (ball-joint + tendon springs included), matching the oracle."""
    xml = _rich(flags='energy="enable"').replace(
        "</mujoco>",
        "<sensor><e_potential name='ep'/><e_kinetic name='ek'/></sensor></mujoco>",
    )
    mj_model, model = _pair(xml)
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[0] = 0.4
    mj_data.qpos[1:5] = [0.8, 0.4, 0.4, 0.2]
    mj_data.qvel[:] = np.linspace(-0.5, 0.8, mj_model.nv)
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model, dtype=jnp.float64)
    d = d.replace(
        qpos=d.qpos.at[0].set(0.4).at[1:5].set(jnp.array([0.8, 0.4, 0.4, 0.2])),
        qvel=jnp.linspace(-0.5, 0.8, model.skel.nv),
    )
    d = jax.jit(forward)(model, d)
    np.testing.assert_allclose(d.sensordata, mj_data.sensordata, rtol=1e-4, atol=1e-7)


def test_fwdinv_flag():
    """mjENBL_FWDINV reports forward/inverse discrepancy norms; on a converged
    contact solve both should be small, and zeros without the flag."""
    xml = OVERRIDE_SCENE.format(flag='fwdinv="enable"')
    mj_model, model = _pair(xml)
    assert model.opt.enableflags & EnableBit.FWDINV
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_forward(mj_model, mj_data)

    d = make_data(model, dtype=jnp.float64)
    d = jax.jit(forward)(model, d)
    fwdinv = np.asarray(d.solver_fwdinv)
    assert np.all(np.isfinite(fwdinv))
    # same convergence scale as the oracle's own diagnostic
    assert np.all(fwdinv < max(1e-6, 10 * float(np.max(mj_data.solver_fwdinv)) + 1e-6))

    # without the flag the diagnostic stays at its make_data zeros
    xml_off = OVERRIDE_SCENE.format(flag='energy="enable"')
    _, model_off = _pair(xml_off)
    d2 = jax.jit(forward)(model_off, make_data(model_off))
    np.testing.assert_array_equal(np.asarray(d2.solver_fwdinv), 0.0)


def test_hessian_bf16_opt_in_close_to_f32():
    """Opt-in bf16 Newton Hessian assembly (Option.hessian_bf16): the Newton
    DIRECTION is perturbed but grad/cost/line-search stay f32, so short
    contact-rich rollouts must track the f32 solve closely."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ambersim_tpu.engine import make_data, step
    from ambersim_tpu.utils.io_utils import load_model_from_file

    m32 = load_model_from_file("models/quadruped/quadruped.xml")
    m16 = load_model_from_file("models/quadruped/quadruped.xml", hessian_bf16=True)
    assert m16.opt.hessian_bf16 and not m32.opt.hessian_bf16
    d = make_data(m32)
    B = 4
    db = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d)

    def roll(m):
        def f(c, _):
            return jax.vmap(lambda dd: step(m, dd))(c), None

        return jax.lax.scan(f, db, None, length=25)[0]

    q32 = np.asarray(jax.jit(lambda: roll(m32))().qpos)
    q16 = np.asarray(jax.jit(lambda: roll(m16))().qpos)
    assert np.abs(q32 - q16).max() < 5e-3
