// Host-side C++ reference stepper: an independent implementation of the
// full pipeline (FK -> CRBA -> RNEA -> actuation/passive -> plane contacts
// + dof friction + joint limits -> Newton constraint solve ->
// implicit-damping Euler) for kinematic trees of free/ball/hinge/slide
// joints, any number of joints per body.
//
// Role: the parity oracle / interactive host stepper that MuJoCo's C engine
// plays for the reference (reference: examples/interactive_simulation.py:57-71,
// SURVEY.md D2). Exposed through a C ABI consumed via ctypes
// (ambersim_tpu/native/__init__.py).
//
// Scope: trees of free/ball/hinge/slide joints with multiple joints per
// moving body (jointless bodies are welded in by the Python wrapper), joint
// springs/dampers/armature, dof friction loss (Huber rows), motor actuators
// with ctrlrange clamping, hinge/slide/ball limits, and plane-vs-
// sphere/capsule/box contacts with MuJoCo's soft-constraint model
// (impedance sigmoid + pyramidal friction cones), solved by the same primal
// Newton iteration as the JAX engine (engine/solver.py) so all three
// engines can be cross-checked on contact-rich flagship models (quadruped,
// humanoid).

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kMinVal = 1e-10;
constexpr double kMinImp = 0.0001;
constexpr double kMaxImp = 0.9999;

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

struct Quat {
  double w = 1, x = 0, y = 0, z = 0;
};

inline Quat mul(Quat u, Quat v) {
  return {u.w * v.w - u.x * v.x - u.y * v.y - u.z * v.z,
          u.w * v.x + u.x * v.w + u.y * v.z - u.z * v.y,
          u.w * v.y - u.x * v.z + u.y * v.w + u.z * v.x,
          u.w * v.z + u.x * v.y - u.y * v.x + u.z * v.w};
}

inline Quat normalize(Quat q) {
  double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
  if (n < 1e-15) return {1, 0, 0, 0};
  return {q.w / n, q.x / n, q.y / n, q.z / n};
}

inline Vec3 rotate(Vec3 v, Quat q) {
  Vec3 u{q.x, q.y, q.z};
  Vec3 c = cross(u, v);
  Vec3 c2 = cross(u, c);
  return v + 2.0 * (q.w * c + c2);
}

inline Quat axis_angle(Vec3 axis, double angle) {
  double h = 0.5 * angle;
  double s = std::sin(h);
  return {std::cos(h), axis.x * s, axis.y * s, axis.z * s};
}

inline Quat conj(Quat q) { return {q.w, -q.x, -q.y, -q.z}; }

// mju_subQuat: 3-vector v with qa = qb * exp(v/2) (local frame)
inline Vec3 quat_sub(Quat qa, Quat qb) {
  Quat dq = normalize(mul(conj(qb), qa));
  if (dq.w < 0) dq = {-dq.w, -dq.x, -dq.y, -dq.z};  // shortest arc
  double s2 = dq.x * dq.x + dq.y * dq.y + dq.z * dq.z;
  if (s2 < 1e-24) return {2.0 * dq.x, 2.0 * dq.y, 2.0 * dq.z};
  double sin_half = std::sqrt(s2);
  double angle = 2.0 * std::atan2(sin_half, dq.w);
  double s = angle / sin_half;
  return {dq.x * s, dq.y * s, dq.z * s};
}

inline void quat_to_mat(Quat q, double R[9]) {
  double w = q.w, x = q.x, y = q.y, z = q.z;
  R[0] = 1 - 2 * (y * y + z * z); R[1] = 2 * (x * y - w * z); R[2] = 2 * (x * z + w * y);
  R[3] = 2 * (x * y + w * z); R[4] = 1 - 2 * (x * x + z * z); R[5] = 2 * (y * z - w * x);
  R[6] = 2 * (x * z - w * y); R[7] = 2 * (y * z + w * x); R[8] = 1 - 2 * (x * x + y * y);
}

struct Spatial {  // (angular, linear)
  Vec3 ang, lin;
};

inline Spatial operator+(Spatial a, Spatial b) { return {a.ang + b.ang, a.lin + b.lin}; }
inline Spatial operator*(double s, Spatial a) { return {s * a.ang, s * a.lin}; }
inline double sdot(Spatial a, Spatial b) { return dot(a.ang, b.ang) + dot(a.lin, b.lin); }
inline Spatial crm(Spatial v, Spatial m) {
  return {cross(v.ang, m.ang), cross(v.lin, m.ang) + cross(v.ang, m.lin)};
}
inline Spatial crf(Spatial v, Spatial f) {
  return {cross(v.ang, f.ang) + cross(v.lin, f.lin), cross(v.ang, f.lin)};
}

enum JntType { JNT_FREE = 0, JNT_BALL = 1, JNT_SLIDE = 2, JNT_HINGE = 3 };
enum GeomKind { GEOM_PLANE = 0, GEOM_SPHERE = 2, GEOM_CAPSULE = 3, GEOM_BOX = 6 };

inline int jnt_qwidth(int t) { return t == JNT_FREE ? 7 : (t == JNT_BALL ? 4 : 1); }
inline int jnt_vwidth(int t) { return t == JNT_FREE ? 6 : (t == JNT_BALL ? 3 : 1); }

struct Model {
  int nbody = 0, njnt = 0, nq = 0, nv = 0, nu = 0, ngeom = 0, npair = 0;
  double timestep = 0.002, impratio = 1.0, tolerance = 1e-8;
  int iterations = 100, ls_iterations = 50;
  double total_mass = 0.0;
  Vec3 gravity{0, 0, -9.81};
  // bodies
  std::vector<int> parent, body_jntadr, body_jntnum;
  std::vector<Vec3> body_pos, body_ipos;
  std::vector<Quat> body_quat, body_iquat;
  std::vector<double> mass;
  std::vector<Vec3> inertia;  // diagonal in inertial frame
  // joints (laid out in body order; body b owns joints
  // [body_jntadr[b], body_jntadr[b]+body_jntnum[b]))
  std::vector<int> jnt_type, jnt_body, jnt_qposadr, jnt_dofadr;
  std::vector<Vec3> jnt_pos, jnt_axis;
  std::vector<double> jnt_stiffness;
  std::vector<int> jnt_limited;
  std::vector<double> jnt_lo, jnt_hi, jnt_margin;
  std::vector<double> jnt_solref, jnt_solimp;  // njnt*2, njnt*5
  // dofs
  std::vector<int> dof_body, dof_jnt;
  std::vector<double> damping, armature, dof_invweight0;
  std::vector<double> dof_frictionloss;
  std::vector<double> dof_solref, dof_solimp;  // nv*2, nv*5
  std::vector<double> qpos0, qpos_spring;
  // geoms
  std::vector<int> geom_type, geom_body;
  std::vector<Vec3> geom_pos;
  std::vector<Quat> geom_quat;
  std::vector<Vec3> geom_size;
  // contact pairs (geom1 = plane)
  std::vector<int> pair_g1, pair_g2, pair_condim;
  std::vector<double> pair_friction;  // npair*5
  std::vector<double> pair_solref;    // npair*2
  std::vector<double> pair_solimp;    // npair*5
  std::vector<double> pair_margin, pair_invweight;
  // actuators
  std::vector<int> act_dof;
  std::vector<double> gear, ctrl_lo, ctrl_hi;
};

struct EfcRow {
  std::vector<double> J;  // nv
  double D = 0, aref = 0, pos = 0;
  double fl = 0;          // frictionloss (friction rows only)
  bool is_fric = false;   // Huber cost (dof friction) vs one-sided quadratic
  bool active = false;
};

struct Data {
  std::vector<double> qpos, qvel, ctrl, qacc_warmstart;
  std::vector<Vec3> xpos, xipos, xanchor, xaxis, gxpos;
  std::vector<Quat> xquat;
  std::vector<double> gxmat;  // ngeom*9
  std::vector<Spatial> cdof, cvel, cdofdot;
  std::vector<double> M;
  std::vector<EfcRow> efc;
};

// ---------- dense linear algebra ----------

bool cholesky(int n, const std::vector<double>& A, std::vector<double>& L) {
  L.assign(n * n, 0.0);
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= L[j * n + k] * L[j * n + k];
    d = std::sqrt(std::max(d, 1e-12));
    L[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double v = A[i * n + j];
      for (int k = 0; k < j; ++k) v -= L[i * n + k] * L[j * n + k];
      L[i * n + j] = v / d;
    }
  }
  return true;
}

void cho_solve(int n, const std::vector<double>& L, std::vector<double>& b) {
  for (int i = 0; i < n; ++i) {
    double v = b[i];
    for (int k = 0; k < i; ++k) v -= L[i * n + k] * b[k];
    b[i] = v / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int k = i + 1; k < n; ++k) v -= L[k * n + i] * b[k];
    b[i] = v / L[i * n + i];
  }
}

void factor_solve(int n, std::vector<double> A, std::vector<double>& b) {
  std::vector<double> L;
  cholesky(n, A, L);
  cho_solve(n, L, b);
}

// ---------- constraint helpers (mirror engine/constraint.py) ----------

double impedance(const double* solimp, double pos) {
  double d0 = solimp[0], dmax = solimp[1], width = solimp[2], mid = solimp[3], power = solimp[4];
  double x = std::min(std::max(std::abs(pos) / std::max(width, kMinVal), 0.0), 1.0);
  mid = std::min(std::max(mid, kMinImp), kMaxImp);
  power = std::max(power, 1.0);
  double a = 1.0 / std::pow(mid, power - 1.0);
  double b = 1.0 / std::pow(1.0 - mid, power - 1.0);
  double y = x < mid ? a * std::pow(x, power) : 1.0 - b * std::pow(1.0 - x, power);
  return std::min(std::max(d0 + y * (dmax - d0), kMinImp), kMaxImp);
}

void kbi(const Model& m, const double* solref, const double* solimp, double pos, double* k,
         double* b, double* imp) {
  *imp = impedance(solimp, pos);
  double tc = solref[0], dr = solref[1];
  tc = std::max(tc, 2.0 * m.timestep);  // refsafe
  double dmax = std::min(std::max(solimp[1], kMinImp), kMaxImp);
  double b_std = 2.0 / (dmax * std::max(tc, kMinVal));
  double k_std = 1.0 / std::max(dmax * dmax * tc * tc * dr * dr, kMinVal);
  if (solref[0] <= 0 && solref[1] <= 0) {  // direct convention
    *k = -solref[0] / std::max(dmax * dmax, kMinVal);
    *b = -solref[1] / std::max(dmax, kMinVal);
  } else {
    *k = k_std;
    *b = b_std;
  }
}

// ---------- pipeline ----------

void fk(const Model& m, Data& d) {
  int nb = m.nbody;
  d.xpos.assign(nb, {});
  d.xquat.assign(nb, {});
  d.xipos.assign(nb, {});
  d.xanchor.assign(m.njnt, {});
  d.xaxis.assign(m.njnt, {});
  for (int b = 1; b < nb; ++b) {
    int p = m.parent[b];
    Vec3 pos = d.xpos[p] + rotate(m.body_pos[b], d.xquat[p]);
    Quat quat = mul(d.xquat[p], m.body_quat[b]);
    for (int jj = 0; jj < m.body_jntnum[b]; ++jj) {
      int j = m.body_jntadr[b] + jj;
      int qa = m.jnt_qposadr[j];
      if (m.jnt_type[j] == JNT_FREE) {
        pos = {d.qpos[qa], d.qpos[qa + 1], d.qpos[qa + 2]};
        quat = normalize({d.qpos[qa + 3], d.qpos[qa + 4], d.qpos[qa + 5], d.qpos[qa + 6]});
        d.xanchor[j] = pos;
        d.xaxis[j] = rotate(m.jnt_axis[j], quat);
      } else if (m.jnt_type[j] == JNT_BALL) {
        Quat qloc = normalize({d.qpos[qa], d.qpos[qa + 1], d.qpos[qa + 2], d.qpos[qa + 3]});
        Vec3 anchor = pos + rotate(m.jnt_pos[j], quat);
        quat = mul(quat, qloc);
        pos = anchor - rotate(m.jnt_pos[j], quat);
        d.xanchor[j] = anchor;
        d.xaxis[j] = rotate(m.jnt_axis[j], quat);
      } else if (m.jnt_type[j] == JNT_HINGE) {
        double angle = d.qpos[qa] - m.qpos0[qa];
        Vec3 anchor = pos + rotate(m.jnt_pos[j], quat);
        quat = mul(quat, axis_angle(m.jnt_axis[j], angle));
        pos = anchor - rotate(m.jnt_pos[j], quat);
        d.xanchor[j] = anchor;
        d.xaxis[j] = rotate(m.jnt_axis[j], quat);
      } else {  // slide
        Vec3 ax = rotate(m.jnt_axis[j], quat);
        pos = pos + (d.qpos[qa] - m.qpos0[qa]) * ax;
        d.xanchor[j] = pos + rotate(m.jnt_pos[j], quat);
        d.xaxis[j] = ax;
      }
    }
    d.xpos[b] = pos;
    d.xquat[b] = normalize(quat);
    d.xipos[b] = d.xpos[b] + rotate(m.body_ipos[b], d.xquat[b]);
  }
  // geom poses
  d.gxpos.assign(m.ngeom, {});
  d.gxmat.assign(m.ngeom * 9, 0.0);
  for (int g = 0; g < m.ngeom; ++g) {
    int b = m.geom_body[g];
    d.gxpos[g] = d.xpos[b] + rotate(m.geom_pos[g], d.xquat[b]);
    quat_to_mat(mul(d.xquat[b], m.geom_quat[g]), &d.gxmat[g * 9]);
  }
}

// com-frame origin (whole-tree com; any consistent origin gives identical
// dynamics, and contact jacobians below use the same origin)
Vec3 com_origin(const Model& m, const Data& d) {
  double mtot = 0;
  Vec3 com{};
  for (int b = 1; b < m.nbody; ++b) {
    mtot += m.mass[b];
    com = com + m.mass[b] * d.xipos[b];
  }
  if (mtot > 0) com = (1.0 / mtot) * com;
  return com;
}

void cdofs(const Model& m, Data& d, Vec3 com) {
  d.cdof.assign(m.nv, {});
  for (int j = 0; j < m.njnt; ++j) {
    int da = m.jnt_dofadr[j];
    int b = m.jnt_body[j];
    if (m.jnt_type[j] == JNT_HINGE) {
      d.cdof[da] = {d.xaxis[j], cross(d.xaxis[j], com - d.xanchor[j])};
    } else if (m.jnt_type[j] == JNT_SLIDE) {
      d.cdof[da] = {Vec3{}, d.xaxis[j]};
    } else {  // free/ball: body-frame rotation axes (+3 world translations)
      if (m.jnt_type[j] == JNT_FREE) {
        d.cdof[da + 0] = {Vec3{}, Vec3{1, 0, 0}};
        d.cdof[da + 1] = {Vec3{}, Vec3{0, 1, 0}};
        d.cdof[da + 2] = {Vec3{}, Vec3{0, 0, 1}};
        da += 3;
      }
      double R[9];
      quat_to_mat(d.xquat[b], R);
      Vec3 anchor = d.xanchor[j];
      for (int k = 0; k < 3; ++k) {
        Vec3 ax{R[0 + k], R[3 + k], R[6 + k]};  // body axis k in world coords
        d.cdof[da + k] = {ax, cross(ax, com - anchor)};
      }
    }
  }
}

struct Inertias {
  std::vector<double> I;  // nbody*9 world rotational inertia about body com
  std::vector<Vec3> h;    // xipos - origin
};

Inertias body_inertias(const Model& m, const Data& d, Vec3 com) {
  Inertias out;
  out.I.assign(m.nbody * 9, 0.0);
  out.h.assign(m.nbody, {});
  for (int b = 1; b < m.nbody; ++b) {
    Quat qi = mul(d.xquat[b], m.body_iquat[b]);
    double R[9];
    quat_to_mat(qi, R);
    double diag[3] = {m.inertia[b].x, m.inertia[b].y, m.inertia[b].z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double v = 0;
        for (int k = 0; k < 3; ++k) v += R[r * 3 + k] * diag[k] * R[c * 3 + k];
        out.I[b * 9 + r * 3 + c] = v;
      }
    out.h[b] = d.xipos[b] - com;
  }
  return out;
}

Spatial apply_inertia(const Model& m, const Inertias& in, int b, Spatial v) {
  Vec3 r = in.h[b];
  const double* Ic = &in.I[b * 9];
  Vec3 Iw{Ic[0] * v.ang.x + Ic[1] * v.ang.y + Ic[2] * v.ang.z,
          Ic[3] * v.ang.x + Ic[4] * v.ang.y + Ic[5] * v.ang.z,
          Ic[6] * v.ang.x + Ic[7] * v.ang.y + Ic[8] * v.ang.z};
  Vec3 ang = Iw + m.mass[b] * cross(r, cross(r, {-v.ang.x, -v.ang.y, -v.ang.z})) +
             m.mass[b] * cross(r, v.lin);
  Vec3 lin = m.mass[b] * cross({-r.x, -r.y, -r.z}, v.ang) + m.mass[b] * v.lin;
  return {ang, lin};
}

void crba(const Model& m, Data& d, const Inertias& in) {
  int nv = m.nv, nb = m.nbody;
  d.M.assign(nv * nv, 0.0);
  for (int i = 0; i < nv; ++i) {
    for (int jj = 0; jj <= i; ++jj) {
      double v = 0;
      int bi = m.dof_body[i];
      for (int b = bi; b < nb; ++b) {
        bool ai = false, aj = false;
        for (int bb = b; bb > 0; bb = m.parent[bb]) {
          if (bb == m.dof_body[i]) ai = true;
          if (bb == m.dof_body[jj]) aj = true;
        }
        if (ai && aj) v += sdot(d.cdof[i], apply_inertia(m, in, b, d.cdof[jj]));
      }
      d.M[i * nv + jj] = v;
      d.M[jj * nv + i] = v;
    }
  }
  for (int i = 0; i < nv; ++i) d.M[i * nv + i] += m.armature[i];
}

std::vector<double> rnea_bias(const Model& m, Data& d, const Inertias& in) {
  int nb = m.nbody, nv = m.nv;
  d.cvel.assign(nb, {});
  d.cdofdot.assign(nv, {});
  for (int b = 1; b < nb; ++b) {
    int p = m.parent[b];
    Spatial v = d.cvel[p];
    for (int jj = 0; jj < m.body_jntnum[b]; ++jj) {
      int j = m.body_jntadr[b] + jj;
      int da = m.jnt_dofadr[j];
      if (m.jnt_type[j] == JNT_FREE) {
        // translation dofs join the running velocity first (zero derivative)
        for (int k = 0; k < 3; ++k) v = v + d.qvel[da + k] * d.cdof[da + k];
        for (int k = 3; k < 6; ++k) d.cdofdot[da + k] = crm(v, d.cdof[da + k]);
        for (int k = 3; k < 6; ++k) v = v + d.qvel[da + k] * d.cdof[da + k];
      } else {
        // hinge/slide/ball: all dofs of the joint differentiate against the
        // running velocity BEFORE the joint's own dofs join (mj_comVel)
        int w = jnt_vwidth(m.jnt_type[j]);
        for (int k = 0; k < w; ++k) d.cdofdot[da + k] = crm(v, d.cdof[da + k]);
        for (int k = 0; k < w; ++k) v = v + d.qvel[da + k] * d.cdof[da + k];
      }
    }
    d.cvel[b] = v;
  }
  std::vector<Spatial> acc(nb, Spatial{});
  std::vector<Spatial> frc(nb, Spatial{});
  acc[0] = {Vec3{}, {-m.gravity.x, -m.gravity.y, -m.gravity.z}};
  for (int b = 1; b < nb; ++b) {
    int p = m.parent[b];
    Spatial a = acc[p];
    for (int jj = 0; jj < m.body_jntnum[b]; ++jj) {
      int j = m.body_jntadr[b] + jj;
      int da = m.jnt_dofadr[j];
      int w = jnt_vwidth(m.jnt_type[j]);
      for (int k = 0; k < w; ++k) a = a + d.qvel[da + k] * d.cdofdot[da + k];
    }
    acc[b] = a;
    Spatial Iv = apply_inertia(m, in, b, d.cvel[b]);
    frc[b] = apply_inertia(m, in, b, acc[b]) + crf(d.cvel[b], Iv);
  }
  for (int b = nb - 1; b > 0; --b)
    if (m.parent[b] > 0) frc[m.parent[b]] = frc[m.parent[b]] + frc[b];
  std::vector<double> bias(nv);
  for (int i = 0; i < nv; ++i) bias[i] = sdot(d.cdof[i], frc[m.dof_body[i]]);
  return bias;
}

// dof i supports body b iff dof i's body is an ancestor of b (or b itself)
bool dof_supports(const Model& m, int dof, int body) {
  int db = m.dof_body[dof];
  for (int bb = body; bb > 0; bb = m.parent[bb])
    if (bb == db) return true;
  return false;
}

// translational jacobian row of a world point on `body` for dof i
Vec3 point_jac(const Model& m, const Data& d, Vec3 com, int dof, Vec3 point) {
  return d.cdof[dof].lin + cross(d.cdof[dof].ang, point - com);
}

void make_contact_rows(const Model& m, Data& d, Vec3 com) {
  int nv = m.nv;
  for (int p = 0; p < m.npair; ++p) {
    int g1 = m.pair_g1[p], g2 = m.pair_g2[p];
    int b2 = m.geom_body[g2];
    const double* Rp = &d.gxmat[g1 * 9];
    Vec3 n{Rp[2], Rp[5], Rp[8]};  // plane z axis
    Vec3 porg = d.gxpos[g1];
    // contact candidates: (dist, pos)
    std::vector<std::pair<double, Vec3>> cands;
    if (m.geom_type[g2] == GEOM_SPHERE) {
      double r = m.geom_size[g2].x;
      double h = dot(d.gxpos[g2] - porg, n);
      double dist = h - r;
      cands.push_back({dist, d.gxpos[g2] - (r + 0.5 * dist) * n});
    } else if (m.geom_type[g2] == GEOM_CAPSULE) {
      // both segment endpoints (mirrors engine/collision.plane_capsule)
      double r = m.geom_size[g2].x, hl = m.geom_size[g2].y;
      const double* Rc = &d.gxmat[g2 * 9];
      Vec3 axis{Rc[2], Rc[5], Rc[8]};  // capsule z axis
      for (double sign : {1.0, -1.0}) {
        Vec3 c = d.gxpos[g2] + (sign * hl) * axis;
        double dist = dot(c - porg, n) - r;
        cands.push_back({dist, c - (r + 0.5 * dist) * n});
      }
    } else {  // box: 4 deepest corners
      const double* Rb = &d.gxmat[g2 * 9];
      Vec3 s = m.geom_size[g2];
      std::vector<std::pair<double, Vec3>> all;
      for (int sx = -1; sx <= 1; sx += 2)
        for (int sy = -1; sy <= 1; sy += 2)
          for (int sz = -1; sz <= 1; sz += 2) {
            Vec3 loc{sx * s.x, sy * s.y, sz * s.z};
            Vec3 pt{Rb[0] * loc.x + Rb[1] * loc.y + Rb[2] * loc.z + d.gxpos[g2].x,
                    Rb[3] * loc.x + Rb[4] * loc.y + Rb[5] * loc.z + d.gxpos[g2].y,
                    Rb[6] * loc.x + Rb[7] * loc.y + Rb[8] * loc.z + d.gxpos[g2].z};
            double dist = dot(pt - porg, n);
            all.push_back({dist, pt - 0.5 * dist * n});
          }
      std::stable_sort(all.begin(), all.end(),
                       [](const auto& a, const auto& b) { return a.first < b.first; });
      for (int k = 0; k < 4; ++k) cands.push_back(all[k]);
    }
    // tangent frame (mirrors engine/collision._make_frame)
    Vec3 ref = std::abs(n.y) <= std::abs(n.x) ? Vec3{0, 1, 0} : Vec3{1, 0, 0};
    Vec3 t1 = ref - dot(n, ref) * n;
    double t1n = std::sqrt(dot(t1, t1));
    t1 = (1.0 / std::max(t1n, 1e-12)) * t1;
    Vec3 t2 = cross(n, t1);

    const double* fric = &m.pair_friction[p * 5];
    const double* solref = &m.pair_solref[p * 2];
    const double* solimp = &m.pair_solimp[p * 5];
    double margin = m.pair_margin[p];
    double invweight = m.pair_invweight[p];
    int condim = m.pair_condim[p];

    for (auto& cd : cands) {
      double dist = cd.first;
      Vec3 pos = cd.second;
      bool active = dist < margin;
      double pc = dist - margin;
      double k, b, imp;
      kbi(m, solref, solimp, pc, &k, &b, &imp);
      double mu0 = fric[0];
      double diag = condim == 1 ? invweight
                                : 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) * invweight / m.impratio;
      double D = imp / std::max((1 - imp) * diag, kMinVal);
      // per-dof translational jacobian of the relative velocity (geom2 is the
      // moving body; plane is on the world side here)
      std::vector<Vec3> jac(nv, Vec3{});
      for (int i = 0; i < nv; ++i)
        if (dof_supports(m, i, b2)) jac[i] = point_jac(m, d, com, i, pos);
      std::vector<double> Jn(nv), Jt1(nv), Jt2(nv);
      for (int i = 0; i < nv; ++i) {
        Jn[i] = dot(n, jac[i]);
        Jt1[i] = dot(t1, jac[i]);
        Jt2[i] = dot(t2, jac[i]);
      }
      int nrow = condim == 1 ? 1 : 2 * (condim - 1);
      for (int r = 0; r < nrow; ++r) {
        EfcRow row;
        row.J.assign(nv, 0.0);
        double sign = (r % 2 == 0) ? 1.0 : -1.0;
        const std::vector<double>* Jt = (condim == 1) ? nullptr : (r / 2 == 0 ? &Jt1 : &Jt2);
        double mu = (condim == 1) ? 0.0 : fric[r / 2];
        double jq = 0;
        for (int i = 0; i < nv; ++i) {
          row.J[i] = Jn[i] + (Jt ? sign * mu * (*Jt)[i] : 0.0);
          jq += row.J[i] * d.qvel[i];
        }
        row.D = D;
        row.pos = dist;
        row.aref = -b * jq - k * imp * pc;
        row.active = active;
        d.efc.push_back(row);
      }
    }
  }
}

void make_friction_rows(const Model& m, Data& d) {
  int nv = m.nv;
  for (int i = 0; i < nv; ++i) {
    if (m.dof_frictionloss[i] <= 0) continue;
    double k, b, imp;
    kbi(m, &m.dof_solref[i * 2], &m.dof_solimp[i * 5], 0.0, &k, &b, &imp);
    EfcRow row;
    row.J.assign(nv, 0.0);
    row.J[i] = 1.0;
    row.pos = 0.0;
    row.D = imp / std::max((1 - imp) * m.dof_invweight0[i], kMinVal);
    row.aref = -b * d.qvel[i];
    row.fl = m.dof_frictionloss[i];
    row.is_fric = true;
    row.active = true;
    d.efc.push_back(row);
  }
}

void make_limit_rows(const Model& m, Data& d) {
  int nv = m.nv;
  for (int j = 0; j < m.njnt; ++j) {
    if (!m.jnt_limited[j]) continue;
    if (m.jnt_type[j] == JNT_FREE) continue;
    int qa = m.jnt_qposadr[j], da = m.jnt_dofadr[j];
    double margin = m.jnt_margin[j];
    double k, b, imp;
    EfcRow row;
    row.J.assign(nv, 0.0);
    if (m.jnt_type[j] == JNT_BALL) {
      // one row on the total rotation angle (mj_instantiateLimit:
      // dist = max(range) - |rotvec|, J = -axis); mirrors
      // engine/constraint.py ball-limit rows
      Quat q = normalize({d.qpos[qa], d.qpos[qa + 1], d.qpos[qa + 2], d.qpos[qa + 3]});
      double sin_half = std::sqrt(q.x * q.x + q.y * q.y + q.z * q.z);
      double angle = 2.0 * std::atan2(sin_half, q.w);
      if (angle > M_PI) angle -= 2.0 * M_PI;
      double sgn = angle >= 0 ? 1.0 : -1.0;
      Vec3 axis{0, 0, 0};
      if (sin_half > kMinVal)
        axis = (sgn / sin_half) * Vec3{q.x, q.y, q.z};
      double maxangle = std::max(m.jnt_lo[j], m.jnt_hi[j]);
      double dist = maxangle - std::abs(angle);
      double pos = dist - margin;
      kbi(m, &m.jnt_solref[j * 2], &m.jnt_solimp[j * 5], pos, &k, &b, &imp);
      row.J[da] = -axis.x;
      row.J[da + 1] = -axis.y;
      row.J[da + 2] = -axis.z;
      double jqvel = row.J[da] * d.qvel[da] + row.J[da + 1] * d.qvel[da + 1] +
                     row.J[da + 2] * d.qvel[da + 2];
      row.pos = pos;
      row.D = imp / std::max((1 - imp) * m.dof_invweight0[da], kMinVal);
      row.aref = -b * jqvel - k * imp * pos;
      row.active = dist < margin;
    } else {
      double q = d.qpos[qa];
      double dist_lo = q - m.jnt_lo[j], dist_hi = m.jnt_hi[j] - q;
      bool lower = dist_lo < dist_hi;
      double dist = lower ? dist_lo : dist_hi;
      double sign = lower ? 1.0 : -1.0;
      double pos = dist - margin;
      kbi(m, &m.jnt_solref[j * 2], &m.jnt_solimp[j * 5], pos, &k, &b, &imp);
      row.J[da] = sign;
      row.pos = pos;
      row.D = imp / std::max((1 - imp) * m.dof_invweight0[da], kMinVal);
      row.aref = -b * sign * d.qvel[da] - k * imp * pos;
      row.active = dist < margin;
    }
    d.efc.push_back(row);
  }
}

// primal Newton solve (mirrors engine/solver.py: one-sided rows, exact
// scalar-Newton line search, scaled-improvement stop)
void solve_constraints(const Model& m, Data& d, const std::vector<double>& qacc_smooth,
                       std::vector<double>& qacc, std::vector<double>& qfrc_constraint) {
  int nv = m.nv;
  int nefc = (int)d.efc.size();
  qacc = qacc_smooth;
  qfrc_constraint.assign(nv, 0.0);
  if (nefc == 0) return;

  auto jar_of = [&](const std::vector<double>& a, std::vector<double>& jar) {
    jar.assign(nefc, 0.0);
    for (int r = 0; r < nefc; ++r) {
      double v = 0;
      for (int i = 0; i < nv; ++i) v += d.efc[r].J[i] * a[i];
      jar[r] = v - d.efc[r].aref;
    }
  };
  // per-row cost/force/quad-mask, matching engine/solver.py _row_costs_pure:
  // friction rows are Huber (quadratic until |D*jar| = fl, then linear),
  // limit/contact rows one-sided quadratic
  auto row_cost = [&](int r, double jarr) -> double {
    const EfcRow& e = d.efc[r];
    if (!e.active) return 0.0;
    if (e.is_fric) {
      if (std::abs(e.D * jarr) > e.fl)
        return e.fl * std::abs(jarr) - 0.5 * e.fl * e.fl / std::max(e.D, 1e-12);
      return 0.5 * e.D * jarr * jarr;
    }
    return jarr < 0 ? 0.5 * e.D * jarr * jarr : 0.0;
  };
  auto row_force = [&](int r, double jarr) -> double {
    const EfcRow& e = d.efc[r];
    if (!e.active) return 0.0;
    if (e.is_fric) {
      if (std::abs(e.D * jarr) > e.fl) return -(jarr > 0 ? 1.0 : -1.0) * e.fl;
      return -e.D * jarr;
    }
    return jarr < 0 ? -e.D * jarr : 0.0;
  };
  auto row_quad = [&](int r, double jarr) -> bool {
    const EfcRow& e = d.efc[r];
    if (!e.active) return false;
    if (e.is_fric) return std::abs(e.D * jarr) <= e.fl;
    return jarr < 0;
  };

  auto cost_of = [&](const std::vector<double>& a, const std::vector<double>& jar) {
    double c = 0;
    std::vector<double> da(nv);
    for (int i = 0; i < nv; ++i) da[i] = a[i] - qacc_smooth[i];
    for (int i = 0; i < nv; ++i) {
      double mv = 0;
      for (int k = 0; k < nv; ++k) mv += d.M[i * nv + k] * da[k];
      c += 0.5 * da[i] * mv;
    }
    for (int r = 0; r < nefc; ++r) c += row_cost(r, jar[r]);
    return c;
  };

  std::vector<double> jar, jar_ws;
  jar_of(qacc, jar);
  double cost = cost_of(qacc, jar);
  if (!d.qacc_warmstart.empty()) {
    jar_of(d.qacc_warmstart, jar_ws);
    double cw = cost_of(d.qacc_warmstart, jar_ws);
    if (cw < cost) {
      qacc = d.qacc_warmstart;
      jar = jar_ws;
      cost = cw;
    }
  }

  double tol = m.tolerance * nv * std::max(m.total_mass, 1.0);
  double prev_cost = 1e300;
  std::vector<double> grad(nv), p(nv), jp(nefc), Mda(nv);

  for (int it = 0; it < std::max(m.iterations, 1); ++it) {
    if (prev_cost - cost <= tol && it > 0) break;
    // grad = M (a - as) - J^T force;  force_r = -D jar_r (active & jar<0)
    for (int i = 0; i < nv; ++i) {
      double mv = 0;
      for (int k = 0; k < nv; ++k) mv += d.M[i * nv + k] * (qacc[k] - qacc_smooth[k]);
      grad[i] = mv;
    }
    for (int r = 0; r < nefc; ++r) {
      double f = row_force(r, jar[r]);
      if (f == 0) continue;
      for (int i = 0; i < nv; ++i) grad[i] -= d.efc[r].J[i] * f;
    }
    // H = M + J^T diag(D * quad) J + 1e-8 I
    std::vector<double> H(d.M);
    for (int r = 0; r < nefc; ++r) {
      if (!row_quad(r, jar[r])) continue;
      double Dr = d.efc[r].D;
      for (int i = 0; i < nv; ++i) {
        if (d.efc[r].J[i] == 0) continue;
        for (int k = 0; k < nv; ++k) H[i * nv + k] += Dr * d.efc[r].J[i] * d.efc[r].J[k];
      }
    }
    for (int i = 0; i < nv; ++i) H[i * nv + i] += 1e-8;
    p = grad;
    factor_solve(nv, H, p);
    for (int i = 0; i < nv; ++i) p[i] = -p[i];
    for (int r = 0; r < nefc; ++r) {
      double v = 0;
      for (int i = 0; i < nv; ++i) v += d.efc[r].J[i] * p[i];
      jp[r] = v;
    }
    // line search: scalar Newton on phi(t)
    double pmp = 0, pma = 0;
    {
      std::vector<double> Mp(nv, 0.0);
      for (int i = 0; i < nv; ++i)
        for (int k = 0; k < nv; ++k) Mp[i] += d.M[i * nv + k] * p[k];
      for (int i = 0; i < nv; ++i) {
        pmp += p[i] * Mp[i];
        double mv = 0;
        for (int k = 0; k < nv; ++k) mv += d.M[i * nv + k] * (qacc[k] - qacc_smooth[k]);
        pma += p[i] * mv;
      }
    }
    double t = 0;
    for (int ls = 0; ls < std::max(m.ls_iterations, 1); ++ls) {
      double g = pma + t * pmp, h = pmp;
      for (int r = 0; r < nefc; ++r) {
        double jart = jar[r] + t * jp[r];
        g -= row_force(r, jart) * jp[r];
        if (row_quad(r, jart)) h += d.efc[r].D * jp[r] * jp[r];
      }
      t -= g / std::max(h, 1e-12);
    }
    t = std::min(std::max(t, 0.0), 4.0);
    std::vector<double> qacc_n(nv), jar_n(nefc);
    for (int i = 0; i < nv; ++i) qacc_n[i] = qacc[i] + t * p[i];
    for (int r = 0; r < nefc; ++r) jar_n[r] = jar[r] + t * jp[r];
    double cost_n = cost_of(qacc_n, jar_n);
    if (cost_n < cost) {
      prev_cost = cost;
      qacc = qacc_n;
      jar = jar_n;
      cost = cost_n;
    } else {
      break;
    }
  }

  for (int r = 0; r < nefc; ++r) {
    double f = row_force(r, jar[r]);
    if (f == 0) continue;
    for (int i = 0; i < nv; ++i) qfrc_constraint[i] += d.efc[r].J[i] * f;
  }
  d.qacc_warmstart = qacc;
}

void step(const Model& m, Data& d) {
  int nv = m.nv;
  fk(m, d);
  Vec3 com = com_origin(m, d);
  cdofs(m, d, com);
  Inertias in = body_inertias(m, d, com);
  crba(m, d, in);
  std::vector<double> bias = rnea_bias(m, d, in);

  // passive + actuation (springs reference qpos_spring; ball/free rotational
  // springs use the quaternion-difference form matching engine/smooth.passive)
  std::vector<double> qfrc(nv, 0.0);
  for (int j = 0; j < m.njnt; ++j) {
    int qa = m.jnt_qposadr[j], da = m.jnt_dofadr[j];
    double k = m.jnt_stiffness[j];
    if (k == 0) continue;
    if (m.jnt_type[j] == JNT_HINGE || m.jnt_type[j] == JNT_SLIDE) {
      qfrc[da] += -k * (d.qpos[qa] - m.qpos_spring[qa]);
    } else if (m.jnt_type[j] == JNT_BALL) {
      Quat q{d.qpos[qa], d.qpos[qa + 1], d.qpos[qa + 2], d.qpos[qa + 3]};
      Quat qs{m.qpos_spring[qa], m.qpos_spring[qa + 1], m.qpos_spring[qa + 2],
              m.qpos_spring[qa + 3]};
      Vec3 dif = quat_sub(q, qs);
      qfrc[da] += -k * dif.x;
      qfrc[da + 1] += -k * dif.y;
      qfrc[da + 2] += -k * dif.z;
    } else {  // FREE: translational + rotational parts
      for (int kk = 0; kk < 3; ++kk)
        qfrc[da + kk] += -k * (d.qpos[qa + kk] - m.qpos_spring[qa + kk]);
      Quat q{d.qpos[qa + 3], d.qpos[qa + 4], d.qpos[qa + 5], d.qpos[qa + 6]};
      Quat qs{m.qpos_spring[qa + 3], m.qpos_spring[qa + 4], m.qpos_spring[qa + 5],
              m.qpos_spring[qa + 6]};
      Vec3 dif = quat_sub(q, qs);
      qfrc[da + 3] += -k * dif.x;
      qfrc[da + 4] += -k * dif.y;
      qfrc[da + 5] += -k * dif.z;
    }
  }
  for (int i = 0; i < nv; ++i) qfrc[i] += -m.damping[i] * d.qvel[i] - bias[i];
  for (int u = 0; u < m.nu; ++u) {
    double c = d.ctrl[u];
    if (m.ctrl_lo[u] < m.ctrl_hi[u]) c = std::min(std::max(c, m.ctrl_lo[u]), m.ctrl_hi[u]);
    qfrc[m.act_dof[u]] += m.gear[u] * c;
  }

  // qacc_smooth = M^-1 qfrc
  std::vector<double> qacc_smooth(qfrc);
  factor_solve(nv, d.M, qacc_smooth);

  // constraints (MuJoCo row order: friction, limits, contacts)
  d.efc.clear();
  make_friction_rows(m, d);
  make_limit_rows(m, d);
  make_contact_rows(m, d, com);
  std::vector<double> qacc, qfrc_constraint;
  solve_constraints(m, d, qacc_smooth, qacc, qfrc_constraint);

  // implicit-damping Euler
  double h = m.timestep;
  bool any_damping = false;
  for (int i = 0; i < nv; ++i)
    if (m.damping[i] > 0) any_damping = true;
  if (any_damping) {
    std::vector<double> A(d.M);
    for (int i = 0; i < nv; ++i) A[i * nv + i] += h * m.damping[i];
    std::vector<double> rhs(nv, 0.0);
    for (int i = 0; i < nv; ++i)
      for (int k = 0; k < nv; ++k) rhs[i] += d.M[i * nv + k] * qacc[k];
    for (int i = 0; i < nv; ++i) rhs[i] *= h;
    factor_solve(nv, A, rhs);
    for (int i = 0; i < nv; ++i) d.qvel[i] += rhs[i];
  } else {
    for (int i = 0; i < nv; ++i) d.qvel[i] += h * qacc[i];
  }

  // position integration (quaternion expmap for free/ball joints)
  for (int j = 0; j < m.njnt; ++j) {
    int qa = m.jnt_qposadr[j], da = m.jnt_dofadr[j];
    if (m.jnt_type[j] == JNT_FREE || m.jnt_type[j] == JNT_BALL) {
      int qr = qa, dr = da;
      if (m.jnt_type[j] == JNT_FREE) {
        for (int k = 0; k < 3; ++k) d.qpos[qa + k] += h * d.qvel[da + k];
        qr = qa + 3;
        dr = da + 3;
      }
      Vec3 w{d.qvel[dr], d.qvel[dr + 1], d.qvel[dr + 2]};
      double wn = std::sqrt(dot(w, w));
      Quat q{d.qpos[qr], d.qpos[qr + 1], d.qpos[qr + 2], d.qpos[qr + 3]};
      if (wn > 1e-14) {
        Quat dq = axis_angle((1.0 / wn) * w, wn * h);
        q = normalize(mul(q, dq));
      }
      d.qpos[qr] = q.w;
      d.qpos[qr + 1] = q.x;
      d.qpos[qr + 2] = q.y;
      d.qpos[qr + 3] = q.z;
    } else {
      d.qpos[qa] += h * d.qvel[da];
    }
  }
}

Model* g_model = nullptr;
Data* g_data = nullptr;

}  // namespace

extern "C" {

// v3 ABI: packed arrays; see ambersim_tpu/native/__init__.py for the layout.
int ambersim_create3(int nbody, int njnt, int nq, int nv, int nu, int ngeom, int npair,
                     const double* opt,        // [timestep, gx, gy, gz, impratio,
                                               //  tolerance, iterations, ls_iterations,
                                               //  total_mass]
                     const int* body_int,      // nbody x 3: parent jntadr jntnum
                     const double* body_real,  // nbody x 18: pos3 quat4 ipos3 iquat4 mass1 inertia3
                     const int* jnt_int,       // njnt x 5: type bodyid qposadr dofadr limited
                     const double* jnt_real,   // njnt x 17: pos3 axis3 stiffness lo hi
                                               //            margin solref2 solimp5
                     const double* dof_real,   // nv x 11: damping armature invweight0
                                               //          frictionloss solref2 solimp5
                     const double* qpos0,      // nq
                     const double* qpos_spring, // nq
                     const int* geom_int,      // ngeom x 2: type bodyid
                     const double* geom_real,  // ngeom x 10: pos3 quat4 size3
                     const int* pair_int,      // npair x 3: g1 g2 condim
                     const double* pair_real,  // npair x 14: friction5 solref2 solimp5
                                               //             includemargin invweight
                     const int* act_int,       // nu: dof id
                     const double* act_real) { // nu x 3: gear ctrllo ctrlhi
  delete g_model;
  delete g_data;
  g_model = new Model();
  Model& m = *g_model;
  m.nbody = nbody;
  m.njnt = njnt;
  m.nq = nq;
  m.nv = nv;
  m.nu = nu;
  m.ngeom = ngeom;
  m.npair = npair;
  m.timestep = opt[0];
  m.gravity = {opt[1], opt[2], opt[3]};
  m.impratio = opt[4];
  m.tolerance = opt[5];
  m.iterations = (int)opt[6];
  m.ls_iterations = (int)opt[7];
  m.total_mass = opt[8];
  for (int b = 0; b < nbody; ++b) {
    m.parent.push_back(body_int[3 * b]);
    m.body_jntadr.push_back(body_int[3 * b + 1]);
    m.body_jntnum.push_back(body_int[3 * b + 2]);
    const double* r = body_real + 18 * b;
    m.body_pos.push_back({r[0], r[1], r[2]});
    m.body_quat.push_back({r[3], r[4], r[5], r[6]});
    m.body_ipos.push_back({r[7], r[8], r[9]});
    m.body_iquat.push_back({r[10], r[11], r[12], r[13]});
    m.mass.push_back(r[14]);
    m.inertia.push_back({r[15], r[16], r[17]});
  }
  m.jnt_solref.assign(njnt * 2, 0.0);
  m.jnt_solimp.assign(njnt * 5, 0.0);
  for (int j = 0; j < njnt; ++j) {
    const int* ji = jnt_int + 5 * j;
    const double* jr = jnt_real + 17 * j;
    m.jnt_type.push_back(ji[0]);
    m.jnt_body.push_back(ji[1]);
    m.jnt_qposadr.push_back(ji[2]);
    m.jnt_dofadr.push_back(ji[3]);
    m.jnt_limited.push_back(ji[4]);
    m.jnt_pos.push_back({jr[0], jr[1], jr[2]});
    m.jnt_axis.push_back({jr[3], jr[4], jr[5]});
    m.jnt_stiffness.push_back(jr[6]);
    m.jnt_lo.push_back(jr[7]);
    m.jnt_hi.push_back(jr[8]);
    m.jnt_margin.push_back(jr[9]);
    for (int k = 0; k < 2; ++k) m.jnt_solref[j * 2 + k] = jr[10 + k];
    for (int k = 0; k < 5; ++k) m.jnt_solimp[j * 5 + k] = jr[12 + k];
    int w = jnt_vwidth(ji[0]);
    for (int k = 0; k < w; ++k) {
      m.dof_body.push_back(ji[1]);
      m.dof_jnt.push_back(j);
    }
  }
  m.dof_solref.assign(nv * 2, 0.0);
  m.dof_solimp.assign(nv * 5, 0.0);
  for (int i = 0; i < nv; ++i) {
    const double* r = dof_real + 11 * i;
    m.damping.push_back(r[0]);
    m.armature.push_back(r[1]);
    m.dof_invweight0.push_back(r[2]);
    m.dof_frictionloss.push_back(r[3]);
    for (int k = 0; k < 2; ++k) m.dof_solref[i * 2 + k] = r[4 + k];
    for (int k = 0; k < 5; ++k) m.dof_solimp[i * 5 + k] = r[6 + k];
  }
  m.qpos0.assign(qpos0, qpos0 + nq);
  m.qpos_spring.assign(qpos_spring, qpos_spring + nq);
  for (int g = 0; g < ngeom; ++g) {
    m.geom_type.push_back(geom_int[2 * g]);
    m.geom_body.push_back(geom_int[2 * g + 1]);
    const double* r = geom_real + 10 * g;
    m.geom_pos.push_back({r[0], r[1], r[2]});
    m.geom_quat.push_back({r[3], r[4], r[5], r[6]});
    m.geom_size.push_back({r[7], r[8], r[9]});
  }
  for (int p = 0; p < npair; ++p) {
    m.pair_g1.push_back(pair_int[3 * p]);
    m.pair_g2.push_back(pair_int[3 * p + 1]);
    m.pair_condim.push_back(pair_int[3 * p + 2]);
    const double* r = pair_real + 14 * p;
    for (int k = 0; k < 5; ++k) m.pair_friction.push_back(r[k]);
    for (int k = 0; k < 2; ++k) m.pair_solref.push_back(r[5 + k]);
    for (int k = 0; k < 5; ++k) m.pair_solimp.push_back(r[7 + k]);
    m.pair_margin.push_back(r[12]);
    m.pair_invweight.push_back(r[13]);
  }
  for (int u = 0; u < nu; ++u) {
    m.act_dof.push_back(act_int[u]);
    m.gear.push_back(act_real[3 * u]);
    m.ctrl_lo.push_back(act_real[3 * u + 1]);
    m.ctrl_hi.push_back(act_real[3 * u + 2]);
  }
  g_data = new Data();
  g_data->qpos.assign(m.qpos0.begin(), m.qpos0.end());
  g_data->qvel.assign(nv, 0.0);
  g_data->ctrl.assign(nu, 0.0);
  return nv;
}

void ambersim_set_state(const double* qpos, const double* qvel) {
  std::memcpy(g_data->qpos.data(), qpos, g_model->nq * sizeof(double));
  std::memcpy(g_data->qvel.data(), qvel, g_model->nv * sizeof(double));
  g_data->qacc_warmstart.clear();
}

void ambersim_set_ctrl(const double* ctrl) {
  std::memcpy(g_data->ctrl.data(), ctrl, g_model->nu * sizeof(double));
}

void ambersim_step(int nsteps) {
  for (int i = 0; i < nsteps; ++i) step(*g_model, *g_data);
}

void ambersim_get_state(double* qpos, double* qvel) {
  std::memcpy(qpos, g_data->qpos.data(), g_model->nq * sizeof(double));
  std::memcpy(qvel, g_data->qvel.data(), g_model->nv * sizeof(double));
}

void ambersim_destroy() {
  delete g_model;
  delete g_data;
  g_model = nullptr;
  g_data = nullptr;
}
}
