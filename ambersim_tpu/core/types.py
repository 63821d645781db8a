"""Model/Data pytrees and enums.

Mirrors the mjModel/mjData split the reference relies on everywhere
(reference: ambersim/rl/base.py:50-52, ambersim/trajopt/shooting.py:114):
``Model`` is the static scene (device-resident, vmap-invariant), ``Data`` is
per-env state (vmapped leading axis).

TPU-first design decision: topology (tree structure, joint/geom types,
addresses) lives in a content-hashed, immutable :class:`Skeleton` stored as
pytree *aux data*, so it is concrete at trace time and drives unrolled
compile-time scheduling (tree levels, static contact pair lists). Numeric
parameters (masses, inertias, gains, ...) are traced jnp leaves, so they can
be swept/vmapped for domain randomization without recompilation.

Enum integer values match MuJoCo's so option overrides written against the
reference API (e.g. solver=2 Newton, integrator=0 Euler as in reference
tests/trajopt/test_predictive_sampler.py:26-30) behave identically.
"""

from __future__ import annotations

import enum
from typing import Any, Tuple

import jax
import numpy as np
from flax import struct


class DisableBit(enum.IntFlag):
    """Option flags disabling pipeline stages (mjtDisableBit, MuJoCo >= 3.9
    numbering: PASSIVE was split into SPRING and DAMPER, shifting every
    higher bit up by one — values verified against the installed oracle).

    MIDPHASE/NATIVECCD/MULTICCD/ISLAND are accepted for XML compatibility but
    are no-ops here: this engine's collision driver is static-pair +
    runtime-top-k (no BVH midphase to toggle) and its narrowphase is exact
    SAT (no CCD variant switch); islands never help a batched dense solve.
    AUTORESET (host-side reset-on-divergence) is likewise a no-op: batched RL
    wrappers own reset semantics (rl/wrappers.py).
    """

    CONSTRAINT = 1 << 0
    EQUALITY = 1 << 1
    FRICTIONLOSS = 1 << 2
    LIMIT = 1 << 3
    CONTACT = 1 << 4
    SPRING = 1 << 5
    DAMPER = 1 << 6
    GRAVITY = 1 << 7
    CLAMPCTRL = 1 << 8
    WARMSTART = 1 << 9
    FILTERPARENT = 1 << 10
    ACTUATION = 1 << 11
    REFSAFE = 1 << 12
    SENSOR = 1 << 13
    MIDPHASE = 1 << 14
    EULERDAMP = 1 << 15
    AUTORESET = 1 << 16
    NATIVECCD = 1 << 17
    ISLAND = 1 << 18
    MULTICCD = 1 << 19
    # compatibility alias for the pre-3.9 flag the reference era used:
    # disabling "passive" means disabling both springs and dampers (and with
    # both set, mj_passive returns early — fluid/gravcomp zeroed too)
    PASSIVE = SPRING | DAMPER


class EnableBit(enum.IntFlag):
    """Option flags enabling optional computations (mjtEnableBit values
    verified against the installed oracle).

    OVERRIDE, ENERGY and FWDINV are implemented; INVDISCRETE and SLEEP are
    accepted for XML compatibility but no-ops (discrete-time inverse is the
    `engine.inverse` default contract here, and sleeping is a host-side
    serial-sim optimization that never pays under vmap)."""

    OVERRIDE = 1 << 0
    ENERGY = 1 << 1
    FWDINV = 1 << 2
    INVDISCRETE = 1 << 3
    SLEEP = 1 << 4
    DIAGEXACT = 1 << 5


class JointType(enum.IntEnum):
    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3

    @property
    def dof_width(self) -> int:
        return {0: 6, 1: 3, 2: 1, 3: 1}[int(self)]

    @property
    def qpos_width(self) -> int:
        return {0: 7, 1: 4, 2: 1, 3: 1}[int(self)]


class GeomType(enum.IntEnum):
    PLANE = 0
    HFIELD = 1
    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6
    MESH = 7


class SolverType(enum.IntEnum):
    PGS = 0
    CG = 1
    NEWTON = 2


class IntegratorType(enum.IntEnum):
    EULER = 0
    RK4 = 1
    IMPLICIT = 2
    IMPLICITFAST = 3


class ConeType(enum.IntEnum):
    PYRAMIDAL = 0
    ELLIPTIC = 1


class EqType(enum.IntEnum):
    CONNECT = 0
    WELD = 1
    JOINT = 2
    TENDON = 3


class TrnType(enum.IntEnum):
    JOINT = 0
    JOINTINPARENT = 1
    SLIDERCRANK = 2
    TENDON = 3
    SITE = 4
    BODY = 5


class DynType(enum.IntEnum):
    NONE = 0
    INTEGRATOR = 1
    FILTER = 2
    FILTEREXACT = 3
    MUSCLE = 4


class GainType(enum.IntEnum):
    FIXED = 0
    AFFINE = 1
    MUSCLE = 2


class BiasType(enum.IntEnum):
    NONE = 0
    AFFINE = 1
    MUSCLE = 2


class CamLightMode(enum.IntEnum):
    """Camera/light tracking modes (MuJoCo-compatible mjtCamLight values)."""

    FIXED = 0
    TRACK = 1
    TRACKCOM = 2
    TARGETBODY = 3
    TARGETBODYCOM = 4


class SensorType(enum.IntEnum):
    """Sensor types (MuJoCo-compatible mjtSensor values, mujoco 3.10)."""

    TOUCH = 0
    ACCELEROMETER = 1
    VELOCIMETER = 2
    GYRO = 3
    FORCE = 4
    TORQUE = 5
    MAGNETOMETER = 6
    RANGEFINDER = 7
    CAMPROJECTION = 8
    JOINTPOS = 9
    JOINTVEL = 10
    TENDONPOS = 11
    TENDONVEL = 12
    ACTUATORPOS = 13
    ACTUATORVEL = 14
    ACTUATORFRC = 15
    JOINTACTFRC = 16
    TENDONACTFRC = 17
    BALLQUAT = 18
    BALLANGVEL = 19
    JOINTLIMITPOS = 20
    JOINTLIMITVEL = 21
    JOINTLIMITFRC = 22
    TENDONLIMITPOS = 23
    TENDONLIMITVEL = 24
    TENDONLIMITFRC = 25
    FRAMEPOS = 26
    FRAMEQUAT = 27
    FRAMEXAXIS = 28
    FRAMEYAXIS = 29
    FRAMEZAXIS = 30
    FRAMELINVEL = 31
    FRAMEANGVEL = 32
    FRAMELINACC = 33
    FRAMEANGACC = 34
    SUBTREECOM = 35
    SUBTREELINVEL = 36
    SUBTREEANGMOM = 37
    INSIDESITE = 38
    GEOMDIST = 39
    GEOMNORMAL = 40
    GEOMFROMTO = 41
    CONTACT = 42
    USER = 48
    E_POTENTIAL = 43
    E_KINETIC = 44
    CLOCK = 45


class ObjType(enum.IntEnum):
    """Object types sensors can attach to (MuJoCo-compatible mjtObj values)."""

    UNKNOWN = 0
    BODY = 1
    XBODY = 2
    JOINT = 3
    GEOM = 5
    SITE = 6
    CAMERA = 7
    TENDON = 18
    ACTUATOR = 19


class SiteType(enum.IntEnum):
    """Site shapes (subset of GeomType; used for touch-sensor zones)."""

    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6


def _freeze(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a)
    a.setflags(write=False)
    return a


class Skeleton:
    """Immutable, content-hashed structural description of a scene.

    Stored as pytree aux data on :class:`Model`, so every field is concrete
    (numpy / python ints) during tracing and can drive compile-time schedules.
    """

    def __init__(self, **fields: Any):
        self._fields = {}
        for k, v in fields.items():
            if isinstance(v, np.ndarray):
                v = _freeze(v)
            elif isinstance(v, list):
                v = tuple(v)
            self._fields[k] = v
        object.__setattr__(self, "_hash", self._compute_hash())

    def _compute_hash(self) -> int:
        items = []
        for k in sorted(self._fields):
            v = self._fields[k]
            if isinstance(v, np.ndarray):
                items.append((k, v.shape, v.dtype.str, v.tobytes()))
            else:
                items.append((k, v))
        return hash(tuple(items))

    def __getattr__(self, name: str):
        try:
            return self._fields[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:  # pragma: no cover
            raise AttributeError("Skeleton is immutable")

    def replace(self, **updates: Any) -> "Skeleton":
        fields = dict(self._fields)
        fields.update(updates)
        return Skeleton(**fields)

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other) -> bool:
        if not isinstance(other, Skeleton):
            return NotImplemented
        if self._hash != other._hash:
            return False
        if set(self._fields) != set(other._fields):
            return False
        for k, v in self._fields.items():
            w = other._fields[k]
            if isinstance(v, np.ndarray):
                if not (isinstance(w, np.ndarray) and v.shape == w.shape and (v == w).all()):
                    return False
            elif v != w:
                return False
        return True

    def __repr__(self) -> str:  # pragma: no cover
        return f"Skeleton({', '.join(sorted(self._fields))})"


@struct.dataclass
class Option:
    """Physics options (cf. mjOption). Integer/control-flow fields are static."""

    timestep: jax.Array
    gravity: jax.Array  # (3,)
    wind: jax.Array  # (3,)
    magnetic: jax.Array  # (3,) global magnetic flux (magnetometer sensors)
    density: jax.Array
    viscosity: jax.Array
    impratio: jax.Array
    tolerance: jax.Array
    noslip_tolerance: jax.Array
    # contact-parameter overrides, applied to every contact when
    # EnableBit.OVERRIDE is set (mjOption o_* fields); traced so they can be
    # swept under vmap for solver-robustness studies
    o_margin: jax.Array = struct.field(default=None)  # scalar
    o_solref: jax.Array = struct.field(default=None)  # (2,)
    o_solimp: jax.Array = struct.field(default=None)  # (5,)
    o_friction: jax.Array = struct.field(default=None)  # (5,)
    # static (affect trace structure / loop counts)
    integrator: int = struct.field(pytree_node=False, default=int(IntegratorType.EULER))
    solver: int = struct.field(pytree_node=False, default=int(SolverType.NEWTON))
    cone: int = struct.field(pytree_node=False, default=int(ConeType.PYRAMIDAL))
    iterations: int = struct.field(pytree_node=False, default=100)
    ls_iterations: int = struct.field(pytree_node=False, default=50)
    noslip_iterations: int = struct.field(pytree_node=False, default=0)
    disableflags: int = struct.field(pytree_node=False, default=0)
    enableflags: int = struct.field(pytree_node=False, default=0)
    # bitmask of disabled actuator groups (<option actuatorgroupdisable>)
    disableactuator: int = struct.field(pytree_node=False, default=0)
    # opt-in bf16 Newton Hessian assembly (large-nv clutter scenes): the
    # J^T diag(h) J product runs with bfloat16 operands / f32 accumulation
    # (~2x HBM traffic + MXU rate). The Hessian only steers the Newton
    # direction — gradient, cost, and line search stay f32 — so solution
    # accuracy is guarded by the masked improvement test. Off by default
    # (fp32 parity suites). Set via load_model_from_file(hessian_bf16=True).
    hessian_bf16: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class Contact:
    """Fixed-capacity contact set (per env).

    Slot layout (which slot belongs to which type-group, its condim, its efc
    rows) is static on the skeleton; slot *content* is traced. geom1/geom2
    carry the actual geom pair per slot: for static pairs they equal the
    skeleton's con_geom1/con_geom2 constants, for broadphase-capped groups
    they are the runtime top-k selection (engine.collision). When the model
    declares <custom numeric max_contact_points>, ncon < skel.ncand and every
    slot is a runtime top-k-by-depth selection over the candidates."""

    dist: jax.Array  # (ncon,)
    pos: jax.Array  # (ncon, 3)
    frame: jax.Array  # (ncon, 3, 3)  rows: normal, tangent1, tangent2
    friction: jax.Array  # (ncon, 5)
    solref: jax.Array  # (ncon, 2)
    solimp: jax.Array  # (ncon, 5)
    includemargin: jax.Array  # (ncon,)
    gap: jax.Array  # (ncon,) — carried from XML; dynamically inert (MuJoCo 3.10)
    geom1: jax.Array  # (ncon,) int32
    geom2: jax.Array  # (ncon,) int32


@struct.dataclass
class Model:
    """Static scene description (device-resident pytree)."""

    skel: Skeleton = struct.field(pytree_node=False)
    opt: Option

    # reference configuration
    qpos0: jax.Array  # (nq,)
    qpos_spring: jax.Array  # (nq,)

    # bodies
    body_pos: jax.Array  # (nbody, 3)
    body_quat: jax.Array  # (nbody, 4)
    body_ipos: jax.Array  # (nbody, 3)
    body_iquat: jax.Array  # (nbody, 4)
    body_mass: jax.Array  # (nbody,)
    body_inertia: jax.Array  # (nbody, 3) diagonal in inertial frame
    body_invweight0: jax.Array  # (nbody, 2)
    body_gravcomp: jax.Array  # (nbody,)

    # joints
    jnt_pos: jax.Array  # (njnt, 3)
    jnt_axis: jax.Array  # (njnt, 3)
    jnt_range: jax.Array  # (njnt, 2)
    jnt_actfrcrange: jax.Array  # (njnt, 2) qfrc_actuator clamp (jnt_actfrclimited on skel)
    jnt_stiffness: jax.Array  # (njnt,)
    jnt_solref: jax.Array  # (njnt, 2)
    jnt_solimp: jax.Array  # (njnt, 5)
    jnt_margin: jax.Array  # (njnt,)

    # dofs
    dof_armature: jax.Array  # (nv,)
    dof_damping: jax.Array  # (nv,)
    dof_frictionloss: jax.Array  # (nv,)
    dof_invweight0: jax.Array  # (nv,)
    dof_solref: jax.Array  # (nv, 2)
    dof_solimp: jax.Array  # (nv, 5)

    # sites
    site_pos: jax.Array  # (nsite, 3)
    site_quat: jax.Array  # (nsite, 4)
    site_size: jax.Array  # (nsite, 3)

    # cameras / lights (mj_camlight kinematics; modes/bodyids on skel).
    # *_0 fields are global offsets at qpos0 (mj_setConst), used by the
    # track/trackcom modes at runtime.
    cam_pos: jax.Array  # (ncam, 3) local offset in body frame
    cam_quat: jax.Array  # (ncam, 4)
    cam_fovy: jax.Array  # (ncam,) vertical field of view (render metadata)
    cam_resolution: jax.Array  # (ncam, 2) image width/height in pixels
    cam_intrinsic: jax.Array  # (ncam, 4) focal xy + principal xy, length units
    cam_sensorsize: jax.Array  # (ncam, 2) sensor size; nonzero -> use intrinsic
    cam_pos0: jax.Array  # (ncam, 3) global offset from body xpos at qpos0
    cam_poscom0: jax.Array  # (ncam, 3) global offset from subtree com at qpos0
    cam_mat0: jax.Array  # (ncam, 3, 3) global orientation at qpos0
    light_pos: jax.Array  # (nlight, 3)
    light_dir: jax.Array  # (nlight, 3) unit direction in body frame
    light_pos0: jax.Array  # (nlight, 3)
    light_poscom0: jax.Array  # (nlight, 3)
    light_dir0: jax.Array  # (nlight, 3)

    # sensors
    sensor_cutoff: jax.Array  # (nsensor,)

    # tendons (fixed tendons: constant joint-space jacobians, precomputed at
    # compile; lengths are linear in qpos)
    tendon_J: jax.Array  # (ntendon, nv) d(length)/d(qvel)
    tendon_Jq: jax.Array  # (ntendon, nq) length = tendon_Jq @ qpos
    tendon_range: jax.Array  # (ntendon, 2)
    tendon_stiffness: jax.Array  # (ntendon,)
    tendon_damping: jax.Array  # (ntendon,)
    tendon_frictionloss: jax.Array  # (ntendon,)
    tendon_lengthspring: jax.Array  # (ntendon, 2) deadband spring range
    tendon_solref_lim: jax.Array  # (ntendon, 2)
    tendon_solimp_lim: jax.Array  # (ntendon, 5)
    tendon_solref_fri: jax.Array  # (ntendon, 2)
    tendon_solimp_fri: jax.Array  # (ntendon, 5)
    tendon_margin: jax.Array  # (ntendon,)
    tendon_length0: jax.Array  # (ntendon,) length at qpos0
    tendon_invweight0: jax.Array  # (ntendon,)

    # geoms
    geom_pos: jax.Array  # (ngeom, 3)
    geom_quat: jax.Array  # (ngeom, 4)
    geom_size: jax.Array  # (ngeom, 3)
    geom_friction: jax.Array  # (ngeom, 3)
    geom_solref: jax.Array  # (ngeom, 2)
    geom_solimp: jax.Array  # (ngeom, 5)
    geom_solmix: jax.Array  # (ngeom,)
    geom_priority: jax.Array  # (ngeom,)
    geom_margin: jax.Array  # (ngeom,)
    geom_gap: jax.Array  # (ngeom,)
    geom_rbound: jax.Array  # (ngeom,)

    # actuators
    actuator_gear: jax.Array  # (nu, 6)
    actuator_ctrlrange: jax.Array  # (nu, 2)
    actuator_forcerange: jax.Array  # (nu, 2)
    actuator_gainprm: jax.Array  # (nu, 9)
    actuator_biasprm: jax.Array  # (nu, 9)
    actuator_dynprm: jax.Array  # (nu, 9)
    actuator_actrange: jax.Array  # (nu, 2) activation clamp (intvelocity/muscle)
    actuator_lengthrange: jax.Array  # (nu, 2) transmission length range (muscle)
    actuator_cranklength: jax.Array  # (nu,) crank rod length (slidercrank)
    actuator_acc0: jax.Array  # (nu,) |M^-1 moment| at qpos0 (muscle force scaling)

    # equality constraints
    eq_data: jax.Array  # (neq, 11)
    eq_solref: jax.Array  # (neq, 2)
    eq_solimp: jax.Array  # (neq, 5)

    # keyframes (<keyframe><key .../>; cf. mjModel.key_*). Names live on
    # skel.key_names; make_data(m, keyframe=...) resets into one.
    key_time: jax.Array  # (nkey,)
    key_qpos: jax.Array  # (nkey, nq)
    key_qvel: jax.Array  # (nkey, nv)
    key_act: jax.Array  # (nkey, na)
    key_ctrl: jax.Array  # (nkey, nu)
    key_mpos: jax.Array  # (nkey, nmocap, 3)
    key_mquat: jax.Array  # (nkey, nmocap, 4)

    # explicit <contact><pair> overrides (indexed via skel.pair_explicit)
    pair_friction: jax.Array  # (npairexp, 5)
    pair_solref: jax.Array  # (npairexp, 2)
    pair_solimp: jax.Array  # (npairexp, 5)
    pair_margin: jax.Array  # (npairexp,)
    pair_gap: jax.Array  # (npairexp,)

    # mesh data: padded convex hulls in the principal frame
    mesh_vert: jax.Array  # (nmesh, maxvert, 3)
    mesh_face_normal: jax.Array  # (nmesh, maxface, 3) outward unit normals (merged polygon faces)
    mesh_face_dist: jax.Array  # (nmesh, maxface) plane offsets (n.x = d on face)
    mesh_face_vert: jax.Array  # (nmesh, maxface, maxfv, 3) face polygon rings, last-vert padded
    mesh_edge: jax.Array  # (nmesh, maxedge, 2, 3) unique edge segments, padded

    # height fields: normalized [0, 1] elevation grids (row = y), zero-padded
    # to the largest grid; size = (radius_x, radius_y, z_scale, base_depth)
    hfield_size: jax.Array  # (nhfield, 4)
    hfield_data: jax.Array  # (nhfield, max_nrow, max_ncol)

    # ---- convenience pass-throughs to the static skeleton ----
    @property
    def nq(self) -> int:
        return self.skel.nq

    @property
    def nv(self) -> int:
        return self.skel.nv

    @property
    def nu(self) -> int:
        return self.skel.nu

    @property
    def na(self) -> int:
        return self.skel.na

    @property
    def nbody(self) -> int:
        return self.skel.nbody

    @property
    def njnt(self) -> int:
        return self.skel.njnt

    @property
    def ngeom(self) -> int:
        return self.skel.ngeom

    @property
    def neq(self) -> int:
        return self.skel.neq

    @property
    def nsite(self) -> int:
        return self.skel.nsite

    @property
    def nsensor(self) -> int:
        return self.skel.nsensor

    @property
    def ntendon(self) -> int:
        return self.skel.ntendon


@struct.dataclass
class Data:
    """Per-env dynamic state + derived quantities (vmapped leading axis)."""

    # inputs / state
    time: jax.Array
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    act: jax.Array  # (na,)
    ctrl: jax.Array  # (nu,)
    qfrc_applied: jax.Array  # (nv,)
    xfrc_applied: jax.Array  # (nbody, 6) — (force, torque) at body com, world (MuJoCo layout)
    qacc_warmstart: jax.Array  # (nv,)
    mocap_pos: jax.Array  # (nmocap, 3) — kinematic target body positions, world frame
    mocap_quat: jax.Array  # (nmocap, 4)

    # kinematics
    xpos: jax.Array  # (nbody, 3)
    xquat: jax.Array  # (nbody, 4)
    xipos: jax.Array  # (nbody, 3)
    ximat: jax.Array  # (nbody, 3, 3)
    xanchor: jax.Array  # (njnt, 3)
    xaxis: jax.Array  # (njnt, 3)
    geom_xpos: jax.Array  # (ngeom, 3)
    geom_xmat: jax.Array  # (ngeom, 3, 3)
    site_xpos: jax.Array  # (nsite, 3)
    site_xmat: jax.Array  # (nsite, 3, 3)
    cam_xpos: jax.Array  # (ncam, 3)
    cam_xmat: jax.Array  # (ncam, 3, 3)
    light_xpos: jax.Array  # (nlight, 3)
    light_xdir: jax.Array  # (nlight, 3)
    ten_length: jax.Array  # (ntendon,)
    ten_velocity: jax.Array  # (ntendon,)
    ten_J: jax.Array  # (ntendon, nv) d(length)/d(qvel); constant rows for fixed
    # tendons, runtime site/wrap-geometry rows for spatial tendons

    # com-based quantities
    subtree_com: jax.Array  # (nbody, 3)
    cinert: jax.Array  # (nbody, 6, 6) spatial inertia in com frame
    cdof: jax.Array  # (nv, 6)
    cdof_dot: jax.Array  # (nv, 6)
    cvel: jax.Array  # (nbody, 6)

    # mass matrix
    qM: jax.Array  # (nv, nv) dense
    qLD: jax.Array  # (nv, nv) Cholesky factor of qM (lower)

    # forces
    qfrc_bias: jax.Array  # (nv,)
    qfrc_passive: jax.Array  # (nv,)
    qfrc_spring: jax.Array  # (nv,)
    qfrc_damper: jax.Array  # (nv,)
    actuator_length: jax.Array  # (nu,)
    actuator_velocity: jax.Array  # (nu,)
    actuator_force: jax.Array  # (nu,)
    act_dot: jax.Array  # (na,)
    qfrc_actuator: jax.Array  # (nv,)
    qfrc_smooth: jax.Array  # (nv,)
    qacc_smooth: jax.Array  # (nv,)
    qfrc_constraint: jax.Array  # (nv,)
    qacc: jax.Array  # (nv,)
    # inverse dynamics output (engine.inverse; mjData.qfrc_inverse role):
    # the applied generalized force that would produce this d.qacc
    qfrc_inverse: jax.Array  # (nv,)

    # constraints
    contact: Contact
    efc_J: jax.Array  # (nefc, nv)
    # factored pyramid-contact basis [N | mu1*T1 | mu2*T2] grouped by kind
    # ((3*ncon3, nv); (0, nv) when the rows don't factor — see
    # engine.constraint.PyramidStructure). Written by make_constraint next to
    # the dense rows; the structured Newton kernel consumes it directly so the
    # dense contact-row writes of efc_J can be dead-code-eliminated inside
    # rollout scans.
    efc_bJ: jax.Array
    # signed values of the one-hot rows (dof friction: +1; scalar joint
    # limits: the dynamic lower/upper sign), in PyramidStructure.diag_rows
    # order ((ndiag,); (0,) when the rows don't factor). Same purpose as
    # efc_bJ: lets the structured solver avoid reading efc_J at all.
    efc_dsc: jax.Array
    efc_D: jax.Array  # (nefc,)
    efc_aref: jax.Array  # (nefc,)
    efc_pos: jax.Array  # (nefc,)
    efc_margin: jax.Array  # (nefc,)
    efc_frictionloss: jax.Array  # (nefc,)
    efc_active: jax.Array  # (nefc,) bool — row participates this step
    efc_force: jax.Array  # (nefc,)

    # sensors (cacc is the post-constraint body spatial acceleration, computed
    # lazily by engine.sensor for acc-stage sensors)
    cacc: jax.Array  # (nbody, 6)
    sensordata: jax.Array  # (nsensordata,)

    # diagnostics, populated only under the corresponding EnableBit (zeros
    # otherwise; always materialized so scan carries keep a stable pytree):
    # energy = (potential, kinetic) as in mj_energyPos/mj_energyVel;
    # solver_fwdinv = (|qfrc_constraint_fwd - inv|, |efc_force_fwd - inv|)
    # as in mj_compareFwdInv
    energy: jax.Array = None  # (2,)
    solver_fwdinv: jax.Array = None  # (2,)


def tree_dtype(x) -> Any:  # pragma: no cover - debugging helper
    return jax.tree.map(lambda a: (a.shape, a.dtype), x)


SkeletonFields = Tuple[str, ...]
