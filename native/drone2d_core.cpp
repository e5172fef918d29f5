// drone2d_tpu native core — float64 host-side reference engine.
//
// The reference repo's only native layer is third-party (pymunk/Chipmunk2D in
// C, SDL under pygame; SURVEY.md §2.2).  This library is the framework's own
// native equivalent: an exact, dependency-free C++ implementation of the
// numerical core — the composite-rigid-body step (Chipmunk integration order,
// see drone2d_tpu/ops/physics.py and reference drone_2d_env.py:400-406) and
// the QPMI2D path model (reference predef_path.py) — used as
//   * a float64 conformance oracle for the device kernels (tests/),
//   * a fast host-side trajectory replayer/debug stepper with no JAX
//     dispatch overhead (thousands of steps per microsecond-scale call).
//
// Exposed as a flat C ABI consumed via ctypes (drone2d_tpu/native).
//
// Build:  g++ -O2 -shared -fPIC -o libdrone2d_core.so drone2d_core.cpp

#include <cmath>
#include <cstdlib>
#include <vector>

namespace {

struct Path {
    int n = 0;                       // waypoint count
    std::vector<double> wx, wy;      // waypoints
    std::vector<double> us;          // cumulative arc parameter per waypoint
    std::vector<double> cx, cy;      // per-segment centered quadratic [a,b,c]
    std::vector<double> centers;     // tau origin per segment
    double length = 0.0;

    int n_segs() const { return n - 2; }
};

// Lagrange quadratic through (t0,p0),(0,p1),(t2,p2) -> a*t^2 + b*t + c
static void fit3(double t0, double t2, double p0, double p1, double p2,
                 double* abc) {
    const double w0 = p0 / (t0 * (t0 - t2));
    const double w1 = p1 / (t0 * t2);
    const double w2 = p2 / (t2 * (t2 - t0));
    abc[0] = w0 + w1 + w2;
    abc[1] = -(w0 * t2 + w1 * (t0 + t2) + w2 * t0);
    abc[2] = p1;
}

static double poly(const std::vector<double>& coef,
                   const std::vector<double>& centers, int j, double u) {
    const double tau = u - centers[j];
    const double* c = &coef[3 * j];
    return (c[0] * tau + c[1]) * tau + c[2];
}

static double dpoly(const std::vector<double>& coef,
                    const std::vector<double>& centers, int j, double u) {
    const double tau = u - centers[j];
    const double* c = &coef[3 * j];
    return 2.0 * c[0] * tau + c[1];
}

// reference get_u_index (predef_path.py:53-63)
static int u_index(const Path& p, double u) {
    int idx = 0;
    for (int k = 1; k < p.n; ++k) idx += (u > p.us[k]) ? 1 : 0;
    return idx;
}

// reference __call__ / calculate_gradient branch structure
// (predef_path.py:88-188), incl. the Python negative-index wrap for u below
// the path start in the membership branch.
static void eval_path(const Path& p, double u, bool deriv, double* out2) {
    const int S = p.n_segs();
    const int n = u_index(p, u);
    const double us_last = p.us[p.n - 1];
    const double us_second_last = p.us[p.n - 2];

    auto ev = [&](const std::vector<double>& coef, int j) {
        return deriv ? dpoly(coef, p.centers, j, u) : poly(coef, p.centers, j, u);
    };

    const bool first = (u >= p.us[0]) && (u <= p.us[1]);
    const bool last = deriv
        ? (u >= us_second_last)
        : (((u >= us_second_last - 0.001) && (u <= us_last)) || n == p.n - 1);

    if (first) {
        out2[0] = ev(p.cx, 0);
        out2[1] = ev(p.cy, 0);
        return;
    }
    if (last) {
        out2[0] = ev(p.cx, S - 1);
        out2[1] = ev(p.cy, S - 1);
        return;
    }
    const int j1 = ((n - 1) % S + S) % S;   // x_params[n-1] with wrap
    const int j2 = n < S ? n : S - 1;
    const double un = p.us[n];
    const double un1 = p.us[n + 1];
    const double mu_r = (u - un) / (un1 - un);
    const double mu_f = (un1 - u) / (un1 - un);
    out2[0] = mu_r * ev(p.cx, j2) + mu_f * ev(p.cx, j1);
    out2[1] = mu_r * ev(p.cy, j2) + mu_f * ev(p.cy, j1);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Physics: composite-drone rigid body, Chipmunk position-first order
// (drone_2d_env.py:400-406 semantics; see ops/physics.py docstring).
// state6 = [x, y, vx, vy, angle, omega], mutated in place.
// ---------------------------------------------------------------------------
void d2t_step_body(double* s, double left_force, double right_force,
                   double dt, double gravity_y, double mass, double inertia,
                   double arm) {
    const double thrust = left_force + right_force;
    const double c = std::cos(s[4]), sn = std::sin(s[4]);
    const double fx = -sn * thrust, fy = c * thrust;   // R(theta) @ (0, F)
    const double torque = arm * (right_force - left_force);

    s[0] += s[2] * dt;              // position first, previous velocity
    s[1] += s[3] * dt;
    s[4] += s[5] * dt;
    s[2] += (fx / mass) * dt;
    s[3] += (gravity_y + fy / mass) * dt;
    s[5] += (torque / inertia) * dt;
}

// n sequential steps with per-step rotor forces (2n doubles) — the replay /
// oracle hot loop, one ctypes call per trajectory.
void d2t_rollout(double* s, const double* forces, int n_steps, double dt,
                 double gravity_y, double mass, double inertia, double arm,
                 double* traj /* n_steps x 6, may be null */) {
    for (int t = 0; t < n_steps; ++t) {
        d2t_step_body(s, forces[2 * t], forces[2 * t + 1], dt, gravity_y,
                      mass, inertia, arm);
        if (traj) for (int k = 0; k < 6; ++k) traj[6 * t + k] = s[k];
    }
}

// thrust mapping (drone_2d_env.py:400-401): F = (a/2 + 0.5) * scale
double d2t_thrust(double action, double scale) {
    return (action / 2.0 + 0.5) * scale;
}

// ---------------------------------------------------------------------------
// QPMI2D path
// ---------------------------------------------------------------------------
void* d2t_path_new(const double* wps_xy, int n) {
    if (n < 3) return nullptr;
    Path* p = new Path();
    p->n = n;
    p->wx.resize(n);
    p->wy.resize(n);
    p->us.resize(n);
    for (int i = 0; i < n; ++i) {
        p->wx[i] = wps_xy[2 * i];
        p->wy[i] = wps_xy[2 * i + 1];
    }
    p->us[0] = 0.0;
    for (int i = 1; i < n; ++i) {
        const double dx = p->wx[i] - p->wx[i - 1];
        const double dy = p->wy[i] - p->wy[i - 1];
        p->us[i] = p->us[i - 1] + std::sqrt(dx * dx + dy * dy);
    }
    p->length = p->us[n - 1];

    const int S = n - 2;
    p->cx.resize(3 * S);
    p->cy.resize(3 * S);
    p->centers.resize(S);
    for (int j = 0; j < S; ++j) {
        const int m = j + 1;  // middle waypoint of the triple
        p->centers[j] = p->us[m];
        const double t0 = p->us[m - 1] - p->us[m];
        const double t2 = p->us[m + 1] - p->us[m];
        fit3(t0, t2, p->wx[m - 1], p->wx[m], p->wx[m + 1], &p->cx[3 * j]);
        fit3(t0, t2, p->wy[m - 1], p->wy[m], p->wy[m + 1], &p->cy[3 * j]);
    }
    return p;
}

void d2t_path_free(void* h) { delete static_cast<Path*>(h); }

double d2t_path_length(void* h) { return static_cast<Path*>(h)->length; }

void d2t_path_point(void* h, double u, double* out2) {
    eval_path(*static_cast<Path*>(h), u, false, out2);
}

void d2t_path_gradient(void* h, double u, double* out2) {
    eval_path(*static_cast<Path*>(h), u, true, out2);
}

double d2t_path_direction_angle(void* h, double u) {
    double g[2];
    eval_path(*static_cast<Path*>(h), u, true, g);
    return std::atan2(g[1], g[0]);
}

// closest-point search over [-margin, L+margin]: dense table argmin + golden
// refine — the float64 oracle for the device kernel's parabolic path
// (predef_path.py:226-248 capability).
double d2t_path_closest_u(void* h, double x, double y, int table_n,
                          double margin, int golden_iters) {
    Path& p = *static_cast<Path*>(h);
    const double lo = -margin, hi = p.length + margin;
    auto f = [&](double u) {
        double q[2];
        eval_path(p, u, false, q);
        const double dx = q[0] - x, dy = q[1] - y;
        return dx * dx + dy * dy;
    };
    int best = 0;
    double best_f = 1e300;
    for (int i = 0; i < table_n; ++i) {
        const double u = lo + (hi - lo) * i / (table_n - 1);
        const double v = f(u);
        if (v < best_f) { best_f = v; best = i; }
    }
    const double du = (hi - lo) / (table_n - 1);
    double a = lo + du * (best - 1), b = lo + du * (best + 1);
    if (a < lo) a = lo;
    if (b > hi) b = hi;
    const double invphi = 0.6180339887498949, invphi2 = 0.3819660112501051;
    double c = a + invphi2 * (b - a), d = a + invphi * (b - a);
    double fc = f(c), fd = f(d);
    for (int i = 0; i < golden_iters; ++i) {
        if (fc < fd) {
            b = d; d = c; fd = fc;
            c = a + invphi2 * (b - a); fc = f(c);
        } else {
            a = c; c = d; fc = fd;
            d = a + invphi * (b - a); fd = f(d);
        }
    }
    return 0.5 * (a + b);
}

void d2t_path_closest_position(void* h, double x, double y, int table_n,
                               double margin, int golden_iters, double* out2) {
    const double u = d2t_path_closest_u(h, x, y, table_n, margin, golden_iters);
    eval_path(*static_cast<Path*>(h), u, false, out2);
}

void d2t_path_lookahead(void* h, double u, double dist, double* out2) {
    Path& p = *static_cast<Path*>(h);
    double ula = u + dist;
    if (ula > p.length) ula = p.length;
    eval_path(p, ula, false, out2);
}

}  // extern "C"
