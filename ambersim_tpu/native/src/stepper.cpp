// Host-side C++ reference stepper: an independent implementation of the
// smooth-dynamics pipeline (FK -> CRBA -> RNEA -> actuation/passive ->
// implicit-damping semi-implicit Euler) for hinge/slide kinematic chains.
//
// Role: the parity oracle / interactive host stepper that MuJoCo's C engine
// plays for the reference (reference: examples/interactive_simulation.py:57-71,
// SURVEY.md D2). Exposed through a C ABI consumed via ctypes
// (ambersim_tpu/native/__init__.py).
//
// Scope: 1-dof joints (hinge/slide), joint springs/dampers/armature, motor
// actuators with ctrlrange clamping. Contacts are the JAX engine's job; this
// oracle covers the smooth path where exact agreement is expected.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

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

struct Model {
  int nbody = 0, njnt = 0, nv = 0, nu = 0;
  double timestep = 0.002;
  Vec3 gravity{0, 0, -9.81};
  std::vector<int> parent;        // nbody
  std::vector<Vec3> body_pos;     // nbody
  std::vector<Quat> body_quat;    // nbody
  std::vector<Vec3> body_ipos;    // nbody
  std::vector<double> mass;       // nbody
  std::vector<Vec3> inertia;      // nbody (diagonal, inertial frame == body frame assumed diag)
  std::vector<Quat> body_iquat;   // nbody
  std::vector<int> jnt_body;      // njnt (one 1-dof joint per moving body)
  std::vector<int> jnt_type;      // njnt: 2=slide, 3=hinge
  std::vector<Vec3> jnt_pos;      // njnt
  std::vector<Vec3> jnt_axis;     // njnt
  std::vector<double> stiffness, springref, damping, armature, qpos0;
  std::vector<int> act_joint;     // nu
  std::vector<double> gear, ctrl_lo, ctrl_hi;  // nu
};

struct Data {
  std::vector<double> qpos, qvel, ctrl;
  // workspace
  std::vector<Vec3> xpos, xipos, xanchor, xaxis;
  std::vector<Quat> xquat;
  std::vector<Spatial> cdof, cvel, cdofdot;
  std::vector<double> M;  // nv*nv
  std::vector<double> qfrc;
};

void factor_solve(int n, std::vector<double>& A, std::vector<double>& b) {
  // Cholesky solve of SPD A x = b (in place on b)
  std::vector<double> L(n * n, 0.0);
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

void step(const Model& m, Data& d) {
  int nb = m.nbody, nv = m.nv;
  // ---- FK ----
  d.xpos.assign(nb, {});
  d.xquat.assign(nb, {});
  d.xipos.assign(nb, {});
  d.xanchor.assign(m.njnt, {});
  d.xaxis.assign(m.njnt, {});
  for (int b = 1; b < nb; ++b) {
    int p = m.parent[b];
    Vec3 pos = d.xpos[p] + rotate(m.body_pos[b], d.xquat[p]);
    Quat quat = mul(d.xquat[p], m.body_quat[b]);
    int j = b - 1;  // one joint per moving body, aligned ids
    if (m.jnt_type[j] == 3) {  // hinge
      double angle = d.qpos[j] - m.qpos0[j];
      Vec3 anchor = pos + rotate(m.jnt_pos[j], quat);
      quat = mul(quat, axis_angle(m.jnt_axis[j], angle));
      pos = anchor - rotate(m.jnt_pos[j], quat);
      d.xanchor[j] = anchor;
      d.xaxis[j] = rotate(m.jnt_axis[j], quat);
    } else {  // slide
      Vec3 ax = rotate(m.jnt_axis[j], quat);
      pos = pos + (d.qpos[j] - m.qpos0[j]) * ax;
      d.xanchor[j] = pos + rotate(m.jnt_pos[j], quat);
      d.xaxis[j] = ax;
    }
    d.xpos[b] = pos;
    d.xquat[b] = quat;
    d.xipos[b] = pos + rotate(m.body_ipos[b], quat);
  }

  // ---- com frame origin: whole-tree com ----
  double mtot = 0;
  Vec3 com{};
  for (int b = 1; b < nb; ++b) {
    mtot += m.mass[b];
    com = com + m.mass[b] * d.xipos[b];
  }
  if (mtot > 0) com = (1.0 / mtot) * com;

  // ---- cdof, cinert ----
  d.cdof.assign(nv, {});
  for (int j = 0; j < m.njnt; ++j) {
    if (m.jnt_type[j] == 3) {
      d.cdof[j] = {d.xaxis[j], cross(d.xaxis[j], com - d.xanchor[j])};
    } else {
      d.cdof[j] = {Vec3{}, d.xaxis[j]};
    }
  }
  // spatial inertia per body about com origin (world axes)
  std::vector<double> I(nb * 9, 0.0);
  std::vector<Vec3> h(nb);  // m*(c-o)
  for (int b = 1; b < nb; ++b) {
    // world inertia = R_i diag R_i^T with R_i = body orientation * iquat
    Quat qi = mul(d.xquat[b], m.body_iquat[b]);
    double R[9];
    {
      double w = qi.w, x = qi.x, y = qi.y, z = qi.z;
      R[0] = 1 - 2 * (y * y + z * z); R[1] = 2 * (x * y - w * z); R[2] = 2 * (x * z + w * y);
      R[3] = 2 * (x * y + w * z); R[4] = 1 - 2 * (x * x + z * z); R[5] = 2 * (y * z - w * x);
      R[6] = 2 * (x * z - w * y); R[7] = 2 * (y * z + w * x); R[8] = 1 - 2 * (x * x + y * y);
    }
    double diag[3] = {m.inertia[b].x, m.inertia[b].y, m.inertia[b].z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double v = 0;
        for (int k = 0; k < 3; ++k) v += R[r * 3 + k] * diag[k] * R[c * 3 + k];
        I[b * 9 + r * 3 + c] = v;
      }
    h[b] = d.xipos[b] - com;
  }

  auto apply_inertia = [&](int b, Spatial v) -> Spatial {
    // f = [I_c + m S(r)S(r)^T, m S(r); m S(r)^T, m E] v   with r = h[b]
    Vec3 r = h[b];
    double* Ic = &I[b * 9];
    Vec3 Iw{Ic[0] * v.ang.x + Ic[1] * v.ang.y + Ic[2] * v.ang.z,
            Ic[3] * v.ang.x + Ic[4] * v.ang.y + Ic[5] * v.ang.z,
            Ic[6] * v.ang.x + Ic[7] * v.ang.y + Ic[8] * v.ang.z};
    // f_ang = I_c w + m r x (-(r x w)) + m r x v ; f_lin = m (w x r) + m v
    Vec3 ang = Iw + m.mass[b] * cross(r, cross(r, {-v.ang.x, -v.ang.y, -v.ang.z})) + m.mass[b] * cross(r, v.lin);
    Vec3 lin = m.mass[b] * cross({-r.x, -r.y, -r.z}, v.ang) + m.mass[b] * v.lin;
    return {ang, lin};
  };

  // ---- CRBA (dense, ancestor chains) ----
  d.M.assign(nv * nv, 0.0);
  // composite inertia applied via subtree supports: M[i][j] = cdof_i . (sum_b in subtree(max) I_b cdof_j)
  // simple O(nv^2 * nb): adequate for an oracle
  for (int i = 0; i < nv; ++i) {
    for (int jj = 0; jj <= i; ++jj) {
      // bodies supported by both dofs: all bodies below body(i) (deeper dof)
      double v = 0;
      for (int b = m.jnt_body[i]; b < nb; ++b) {
        // is dof i an ancestor of b and dof jj an ancestor of b?
        bool ai = false, aj = false;
        for (int bb = b; bb > 0; bb = m.parent[bb]) {
          if (bb == m.jnt_body[i]) ai = true;
          if (bb == m.jnt_body[jj]) aj = true;
        }
        if (ai && aj) v += sdot(d.cdof[i], apply_inertia(b, d.cdof[jj]));
      }
      d.M[i * nv + jj] = v;
      d.M[jj * nv + i] = v;
    }
  }
  for (int i = 0; i < nv; ++i) d.M[i * nv + i] += m.armature[i];

  // ---- velocities + RNEA bias ----
  d.cvel.assign(nb, {});
  d.cdofdot.assign(nv, {});
  for (int b = 1; b < nb; ++b) {
    int p = m.parent[b];
    Spatial v = d.cvel[p];
    int j = b - 1;
    d.cdofdot[j] = crm(v, d.cdof[j]);
    d.cvel[b] = v + d.qvel[j] * d.cdof[j];
  }
  std::vector<Spatial> acc(nb, Spatial{});
  std::vector<Spatial> frc(nb, Spatial{});
  acc[0] = {Vec3{}, {-m.gravity.x, -m.gravity.y, -m.gravity.z}};
  for (int b = 1; b < nb; ++b) {
    int p = m.parent[b];
    int j = b - 1;
    acc[b] = acc[p] + d.qvel[j] * d.cdofdot[j];
    Spatial Iv = apply_inertia(b, d.cvel[b]);
    frc[b] = apply_inertia(b, acc[b]) + crf(d.cvel[b], Iv);
  }
  for (int b = nb - 1; b > 0; --b)
    if (m.parent[b] > 0) frc[m.parent[b]] = frc[m.parent[b]] + frc[b];
  std::vector<double> qfrc_bias(nv);
  for (int j = 0; j < nv; ++j) qfrc_bias[j] = sdot(d.cdof[j], frc[m.jnt_body[j]]);

  // ---- passive + actuation ----
  d.qfrc.assign(nv, 0.0);
  for (int j = 0; j < nv; ++j)
    d.qfrc[j] = -m.stiffness[j] * (d.qpos[j] - m.springref[j]) - m.damping[j] * d.qvel[j] - qfrc_bias[j];
  for (int u = 0; u < m.nu; ++u) {
    double c = d.ctrl[u];
    if (m.ctrl_lo[u] < m.ctrl_hi[u]) c = std::min(std::max(c, m.ctrl_lo[u]), m.ctrl_hi[u]);
    d.qfrc[m.act_joint[u]] += m.gear[u] * c;
  }

  // ---- implicit-damping Euler: (M + h D) dv = h * qfrc_total ----
  double hstep = m.timestep;
  std::vector<double> A(d.M);
  bool any_damping = false;
  for (int j = 0; j < nv; ++j)
    if (m.damping[j] > 0) any_damping = true;
  std::vector<double> rhs(nv);
  if (any_damping) {
    for (int j = 0; j < nv; ++j) A[j * nv + j] += hstep * m.damping[j];
    for (int j = 0; j < nv; ++j) rhs[j] = hstep * d.qfrc[j];
    factor_solve(nv, A, rhs);
    for (int j = 0; j < nv; ++j) d.qvel[j] += rhs[j];
  } else {
    for (int j = 0; j < nv; ++j) rhs[j] = d.qfrc[j];
    factor_solve(nv, A, rhs);
    for (int j = 0; j < nv; ++j) d.qvel[j] += hstep * rhs[j];
  }
  for (int j = 0; j < nv; ++j) d.qpos[j] += hstep * d.qvel[j];
}

Model* g_model = nullptr;
Data* g_data = nullptr;

}  // namespace

extern "C" {

int ambersim_create(int nbody, int nu, double timestep, const double* gravity,
                    const int* parent, const double* body_pos, const double* body_quat,
                    const double* body_ipos, const double* body_iquat, const double* mass,
                    const double* inertia, const int* jnt_type, const double* jnt_pos,
                    const double* jnt_axis, const double* stiffness, const double* springref,
                    const double* damping, const double* armature, const double* qpos0,
                    const int* act_joint, const double* gear, const double* ctrlrange) {
  delete g_model;
  delete g_data;
  g_model = new Model();
  Model& m = *g_model;
  m.nbody = nbody;
  m.njnt = m.nv = nbody - 1;
  m.nu = nu;
  m.timestep = timestep;
  m.gravity = {gravity[0], gravity[1], gravity[2]};
  m.parent.assign(parent, parent + nbody);
  for (int b = 0; b < nbody; ++b) {
    m.body_pos.push_back({body_pos[3 * b], body_pos[3 * b + 1], body_pos[3 * b + 2]});
    m.body_quat.push_back({body_quat[4 * b], body_quat[4 * b + 1], body_quat[4 * b + 2], body_quat[4 * b + 3]});
    m.body_ipos.push_back({body_ipos[3 * b], body_ipos[3 * b + 1], body_ipos[3 * b + 2]});
    m.body_iquat.push_back({body_iquat[4 * b], body_iquat[4 * b + 1], body_iquat[4 * b + 2], body_iquat[4 * b + 3]});
    m.mass.push_back(mass[b]);
    m.inertia.push_back({inertia[3 * b], inertia[3 * b + 1], inertia[3 * b + 2]});
  }
  for (int j = 0; j < m.njnt; ++j) {
    m.jnt_body.push_back(j + 1);
    m.jnt_type.push_back(jnt_type[j]);
    m.jnt_pos.push_back({jnt_pos[3 * j], jnt_pos[3 * j + 1], jnt_pos[3 * j + 2]});
    m.jnt_axis.push_back({jnt_axis[3 * j], jnt_axis[3 * j + 1], jnt_axis[3 * j + 2]});
  }
  m.stiffness.assign(stiffness, stiffness + m.nv);
  m.springref.assign(springref, springref + m.nv);
  m.damping.assign(damping, damping + m.nv);
  m.armature.assign(armature, armature + m.nv);
  m.qpos0.assign(qpos0, qpos0 + m.nv);
  for (int u = 0; u < nu; ++u) {
    m.act_joint.push_back(act_joint[u]);
    m.gear.push_back(gear[u]);
    m.ctrl_lo.push_back(ctrlrange[2 * u]);
    m.ctrl_hi.push_back(ctrlrange[2 * u + 1]);
  }
  g_data = new Data();
  g_data->qpos.assign(m.qpos0.begin(), m.qpos0.end());
  g_data->qvel.assign(m.nv, 0.0);
  g_data->ctrl.assign(nu, 0.0);
  return m.nv;
}

void ambersim_set_state(const double* qpos, const double* qvel) {
  std::memcpy(g_data->qpos.data(), qpos, g_model->nv * sizeof(double));
  std::memcpy(g_data->qvel.data(), qvel, g_model->nv * sizeof(double));
}

void ambersim_set_ctrl(const double* ctrl) {
  std::memcpy(g_data->ctrl.data(), ctrl, g_model->nu * sizeof(double));
}

void ambersim_step(int nsteps) {
  for (int i = 0; i < nsteps; ++i) step(*g_model, *g_data);
}

void ambersim_get_state(double* qpos, double* qvel) {
  std::memcpy(qpos, g_data->qpos.data(), g_model->nv * sizeof(double));
  std::memcpy(qvel, g_data->qvel.data(), g_model->nv * sizeof(double));
}

void ambersim_destroy() {
  delete g_model;
  delete g_data;
  g_model = nullptr;
  g_data = nullptr;
}
}
