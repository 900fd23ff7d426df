// Standalone golden generator for the LBL Voigt-LTE hot path.
//
// Purpose: anchor arts_tpu's line-by-line absorption (arts_tpu/lbl/voigt.py)
// to the reference implementation's numbers (m-brath/arts, arts3-dev).
// Every function below is transcribed 1:1 from the reference sources with
// file:line citations (relative to /root/reference), and the Faddeeva
// function w(z) is the reference's OWN 3rdparty implementation compiled
// unmodified alongside this file -- the same object the reference's hot
// loop calls (lbl_lineshape_voigt_lte.cpp:239).
//
// Build + regenerate (requires the read-only reference checkout):
//   g++ -O2 -std=c++17 -I/root/reference/3rdparty \
//       gen_lbl_goldens.cpp /root/reference/3rdparty/Faddeeva/Faddeeva.cc \
//       -o /tmp/gen_lbl_goldens
//   /tmp/gen_lbl_goldens > ../../tests/goldens/lbl_goldens.json
//
// Consumed by tests/test_lbl_goldens.py.

#include <Faddeeva/Faddeeva.hh>

#include <cmath>
#include <complex>
#include <cstdio>
#include <string>
#include <vector>

using Complex = std::complex<double>;

// ---------------------------------------------------------------------------
// Constants (src/core/util/arts_constants.h; SI 2019 exact values)
// ---------------------------------------------------------------------------
static constexpr double c_light = 299792458.0;
static constexpr double h_planck = 6.62607015e-34;
static constexpr double k_boltz = 1.380649e-23;
static constexpr double NA = 6.02214076e23;
static constexpr double R_gas = NA * k_boltz;
// arts_constants.h:252 doppler_broadening_const_squared = 2000 R / c^2
static constexpr double dbc2 = 2000.0 * R_gas / (c_light * c_light);
static const double inv_sqrt_pi = 1.0 / std::sqrt(M_PI);
static constexpr double T_cmb = 2.735;  // arts_tpu convention (constants.py:61)

// ---------------------------------------------------------------------------
// Temperature laws (src/core/lbl/lbl_temperature_model.h:63-280)
// Law ids match arts_tpu.lbl.tmodel.Law.
// ---------------------------------------------------------------------------
enum Law { NONE = 0, T0 = 1, T1 = 2, T2 = 3, T3 = 4, T4 = 5, T5 = 6,
           AER = 7, DPL = 8, POLY = 9 };

static double eval_law(int law, const double x[4], double t0, double t) {
  switch (law) {
    case NONE: return 0.0;
    case T0:   return x[0];                                  // :63
    case T1:   return x[0] * std::pow(t0 / t, x[1]);         // :67
    case T2:   return x[0] * std::pow(t0 / t, x[1]) *
                      (1.0 + x[2] * std::log(t / t0));       // :87
    case T3:   return x[0] + x[1] * (t - t0);                // :117
    case T4:   return (x[0] + x[1] * (t0 / t - 1.0)) *
                      std::pow(t0 / t, x[2]);                // :131
    case T5:   return x[0] * std::pow(t0 / t, 0.25 + 1.5 * x[1]);  // :160
    case AER:  // :239 piecewise-linear over (200,250,296,340) K knots
      if (t < 250.0) return x[0] + (t - 200.0) * (x[1] - x[0]) / 50.0;
      if (t > 296.0) return x[2] + (t - 296.0) * (x[3] - x[2]) / 44.0;
      return x[1] + (t - 250.0) * (x[2] - x[1]) / 46.0;
    case DPL:  return x[0] * std::pow(t0 / t, x[1]) +
                      x[2] * std::pow(t0 / t, x[3]);         // :180
    case POLY: // :218 (4 coefficients here)
      return x[0] + t * (x[1] + t * (x[2] + t * x[3]));
  }
  return NAN;
}

// ---------------------------------------------------------------------------
// Lineshape model: 9 variables, pressure powers + VMR mixing
// (src/core/lbl/lbl_lineshape_model.cpp:14-36 VARIABLE macro: G0,D0,G2,D2,
//  FVC scale as P; ETA as 1; Y as P; G,DV as P^2;
//  :72-92 model::<var>(atm): VMR-weighted over perturbers, Bath remainder)
// Variable order matches arts_tpu.lbl.tmodel.VARS.
// ---------------------------------------------------------------------------
enum Var { G0 = 0, D0, G2, D2, ETA, FVC, Y, G, DV, NV };
static const int P_POW[NV] = {1, 1, 1, 1, 0, 1, 1, 2, 2};

static const int SPEC_BATH = -2;  // matches arts_tpu.lbl.catalog.BATH

struct TModel { int law = NONE; double x[4] = {0, 0, 0, 0}; };
struct Perturber { int spec = SPEC_BATH; TModel v[NV]; };

struct Line {
  double f0, a, e0, gu, gl, mass, ratio;
  int spec_idx, iso_idx;
  double t0 = 296.0;
  double cutoff = INFINITY;  // INFINITY = no cutoff
  std::vector<Perturber> ls;
};

// model::<var>(atm)  (lbl_lineshape_model.cpp:72-92)
static double ls_var(const Line& ln, int var, double T, double P,
                     const std::vector<double>& vmr) {
  double vsum = 0.0, res = 0.0, bath = NAN;
  for (const auto& pert : ln.ls) {
    double val = eval_law(pert.v[var].law, pert.v[var].x, ln.t0, T) *
                 std::pow(P, P_POW[var]);
    if (pert.spec != SPEC_BATH) {
      vsum += vmr[pert.spec];
      res += vmr[pert.spec] * val;
    } else {
      bath = val;
    }
  }
  if (!std::isnan(bath)) return res + (1.0 - vsum) * bath;
  return res / vsum;
}

// ---------------------------------------------------------------------------
// Partition function: polynomial Q(T) = sum_k q[k] T^k (same Horner as
// arts_tpu.lbl.partfun.PartFunTable.Q coefficient form)
// ---------------------------------------------------------------------------
struct PartFun { std::vector<std::vector<double>> coeffs; /* [iso][k] */ };

static double Qfun(const PartFun& pf, double T, int iso) {
  const auto& c = pf.coeffs[iso];
  double out = c.back();
  for (int k = (int)c.size() - 2; k >= 0; --k) out = out * T + c[k];
  return out;
}

// ---------------------------------------------------------------------------
// Single-shape + band sum (src/core/lbl/lbl_lineshape_voigt_lte.cpp)
// ---------------------------------------------------------------------------
struct SingleShape { double f0, inv_gd, z_imag, cutoff; Complex s; };

// line_strength s(T,Q): lbl_data.h:66  a*gu*exp(-e0/kT)/(f0^3 Q)
// line_strength_calc: lbl_lineshape_voigt_lte.cpp:22-36
//   inv_sqrt_pi * inv_gd * r * x * (1+G, -Y) * s(T,Q)
// single_shape_builder: lbl_lineshape_voigt_lte.cpp:165-204
//   f0' = f0 + D0 + DV (line_center_calc :145), inv_gd = 1/(sqrt(dbc2 T/m) f0'),
//   z_imag = G0 * inv_gd
static SingleShape make_shape(const Line& ln, const PartFun& pf, double T,
                              double P, const std::vector<double>& vmr) {
  SingleShape s;
  const double D0v = ls_var(ln, D0, T, P, vmr);
  const double DVv = ls_var(ln, DV, T, P, vmr);
  const double G0v = ls_var(ln, G0, T, P, vmr);
  const double Gv = ls_var(ln, G, T, P, vmr);
  const double Yv = ls_var(ln, Y, T, P, vmr);

  s.f0 = ln.f0 + D0v + DVv;
  s.inv_gd = 1.0 / (std::sqrt(dbc2 * T / ln.mass) * s.f0);
  s.z_imag = G0v * s.inv_gd;
  s.cutoff = ln.cutoff;

  const double Q = Qfun(pf, T, ln.iso_idx);
  const double slte =
      ln.a * ln.gu * std::exp(-ln.e0 / (k_boltz * T)) / (std::pow(ln.f0, 3) * Q);
  const Complex lm{1.0 + Gv, -Yv};
  s.s = inv_sqrt_pi * s.inv_gd * ln.ratio * vmr[ln.spec_idx] * lm * slte;
  return s;
}

// band_shape::operator()(cut, f): lbl_lineshape_voigt_lte.cpp:591-608
//   inside |f - f0'| <= cutoff: s * (w(z(f)) - w(z(f0'+cutoff))); else 0.
//   z(f) = inv_gd (f - f0') + i z_imag (lbl_lineshape_voigt_lte.h:48).
// mirrored variant (lbl_lineshape_voigt_lte_mirrored.cpp:220):
//   F(f) = w(z(f)) + w(zm(f)), zm = inv_gd (f + f0') + i z_imag.
static Complex band_sum(const std::vector<SingleShape>& shapes, double f,
                        bool mirrored) {
  Complex out{0.0, 0.0};
  for (const auto& s : shapes) {
    const bool has_cut = std::isfinite(s.cutoff);
    if (has_cut && std::abs(f - s.f0) > s.cutoff) continue;
    Complex w = Faddeeva::w(Complex{s.inv_gd * (f - s.f0), s.z_imag});
    if (mirrored)
      w += Faddeeva::w(Complex{s.inv_gd * (f + s.f0), s.z_imag});
    if (has_cut) {
      Complex wc = Faddeeva::w(Complex{s.inv_gd * s.cutoff, s.z_imag});
      if (mirrored)
        wc += Faddeeva::w(
            Complex{s.inv_gd * (2.0 * s.f0 + s.cutoff), s.z_imag});
      w -= wc;
    }
    out += s.s * w;
  }
  return out;
}

// Absorption coefficient [1/m] (calculate(), lbl_lineshape_voigt_lte.cpp:
//   pm[i] += scl[i]*shape[i]; scl = -N f expm1(-hf/kT) c^2/(8 pi), :936-956;
//   N = P/(kT), physics_funcs.h:54)
static std::vector<double> absorption(const std::vector<Line>& lines,
                                      const PartFun& pf, double T, double P,
                                      const std::vector<double>& vmr,
                                      const std::vector<double>& f_grid,
                                      bool mirrored) {
  std::vector<SingleShape> shapes;
  shapes.reserve(lines.size());
  for (const auto& ln : lines) shapes.push_back(make_shape(ln, pf, T, P, vmr));

  const double N = P / (k_boltz * T);
  std::vector<double> alpha(f_grid.size());
  for (size_t i = 0; i < f_grid.size(); ++i) {
    const double f = f_grid[i];
    const double scl = -N * f * std::expm1(-(h_planck * f) / (k_boltz * T)) *
                       (c_light * c_light / (8.0 * M_PI));
    alpha[i] = scl * band_sum(shapes, f, mirrored).real();
  }
  return alpha;
}

// Planck B(f,T) (arts_tpu.ops.planck / physics_funcs.cc planck)
static double planck(double f, double T) {
  return 2.0 * h_planck * f * (f / c_light) * (f / c_light) /
         std::expm1(h_planck * f / (k_boltz * T));
}

// Clear-sky emission, "constant" discretization
// (rtepack_rtestep.cc:374 rte_emission / arts_tpu.rtepack.emission):
//   I <- T (I - Jbar) + Jbar, T = exp(-0.5 (k_i + k_{i+1}) dr), from the
//   background end to the observer (level 0).
static std::vector<double> radiance(
    const std::vector<std::vector<double>>& k,  // [nlev][nf] observer->bg
    const std::vector<std::vector<double>>& J,  // [nlev][nf]
    const std::vector<double>& dr,              // [nlev-1]
    const std::vector<double>& I0) {            // [nf] background
  const size_t nlev = k.size(), nf = I0.size();
  std::vector<double> I = I0;
  for (size_t lay = nlev - 1; lay >= 1; --lay) {
    for (size_t i = 0; i < nf; ++i) {
      const double t =
          std::exp(-0.5 * (k[lay - 1][i] + k[lay][i]) * dr[lay - 1]);
      const double jbar = 0.5 * (J[lay - 1][i] + J[lay][i]);
      I[i] = t * (I[i] - jbar) + jbar;
    }
  }
  return I;
}

// ---------------------------------------------------------------------------
// JSON emission helpers
// ---------------------------------------------------------------------------
static void emit_array(const std::vector<double>& v) {
  printf("[");
  for (size_t i = 0; i < v.size(); ++i)
    printf("%s%.17g", i ? "," : "", v[i]);
  printf("]");
}

static void emit_line(const Line& ln, bool last) {
  printf("      {\"f0\":%.17g,\"a\":%.17g,\"e0\":%.17g,\"gu\":%g,\"gl\":%g,"
         "\"mass\":%.17g,\"ratio\":%.17g,\"spec_idx\":%d,\"iso_idx\":%d,"
         "\"t0\":%g,\"cutoff\":%s,\"ls\":[",
         ln.f0, ln.a, ln.e0, ln.gu, ln.gl, ln.mass, ln.ratio, ln.spec_idx,
         ln.iso_idx, ln.t0,
         std::isfinite(ln.cutoff)
             ? (std::string("\"") + std::to_string(ln.cutoff) + "\"").c_str()
             : "\"inf\"");
  for (size_t j = 0; j < ln.ls.size(); ++j) {
    const auto& p = ln.ls[j];
    printf("%s{\"spec\":%d,\"v\":[", j ? "," : "", p.spec);
    for (int v = 0; v < NV; ++v) {
      printf("%s{\"law\":%d,\"x\":[%.17g,%.17g,%.17g,%.17g]}", v ? "," : "",
             p.v[v].law, p.v[v].x[0], p.v[v].x[1], p.v[v].x[2], p.v[v].x[3]);
    }
    printf("]}");
  }
  printf("]}%s\n", last ? "" : ",");
}

struct Scenario {
  std::string name;
  std::vector<Line> lines;
  PartFun pf;
  double T, P;
  std::vector<double> vmr;
  std::vector<double> f_grid;
  bool mirrored = false;
};

static void emit_scenario(const Scenario& sc, const std::vector<double>& alpha,
                          bool last) {
  printf("  \"%s\": {\n", sc.name.c_str());
  printf("    \"T\": %.17g, \"P\": %.17g, \"mirrored\": %s,\n", sc.T, sc.P,
         sc.mirrored ? "true" : "false");
  printf("    \"vmr\": ");
  emit_array(sc.vmr);
  printf(",\n    \"q_coeffs\": [");
  for (size_t i = 0; i < sc.pf.coeffs.size(); ++i) {
    if (i) printf(",");
    emit_array(sc.pf.coeffs[i]);
  }
  printf("],\n    \"f_grid\": ");
  emit_array(sc.f_grid);
  printf(",\n    \"lines\": [\n");
  for (size_t i = 0; i < sc.lines.size(); ++i)
    emit_line(sc.lines[i], i + 1 == sc.lines.size());
  printf("    ],\n    \"alpha\": ");
  emit_array(alpha);
  printf("\n  }%s\n", last ? "" : ",");
}

// ---------------------------------------------------------------------------
// Scenario construction (deterministic; no RNG)
// ---------------------------------------------------------------------------
static std::vector<double> linspace(double a, double b, int n) {
  std::vector<double> v(n);
  for (int i = 0; i < n; ++i) v[i] = a + (b - a) * i / (n - 1);
  return v;
}

static TModel tm(int law, double x0, double x1 = 0, double x2 = 0,
                 double x3 = 0) {
  TModel t;
  t.law = law;
  t.x[0] = x0; t.x[1] = x1; t.x[2] = x2; t.x[3] = x3;
  return t;
}

int main() {
  std::vector<Scenario> scs;

  // Shared: 3-species vmr vector (0: H2O-like self, 1: O2-like, 2: N2-like)
  const std::vector<double> vmr3{0.01, 0.2095, 0.7808};
  // Q(T): quadratic polynomials per isotopologue (2 isos)
  PartFun pf2{{{-10.0, 0.6, 0.0009}, {5.0, 0.32, 0.0012}}};

  {  // 1. Single line, single perturber, T1 laws, no cutoff
    Scenario sc;
    sc.name = "single_line_t1";
    sc.T = 250.0; sc.P = 5.0e4; sc.vmr = vmr3; sc.pf = pf2;
    Line ln;
    ln.f0 = 100.0e9; ln.a = 2.5e-5; ln.e0 = 3.2e-21; ln.gu = 9; ln.gl = 7;
    ln.mass = 18.0105646863; ln.ratio = 0.997; ln.spec_idx = 0; ln.iso_idx = 0;
    Perturber p; p.spec = 2;
    p.v[G0] = tm(T1, 2.7e4, 0.73);
    p.v[D0] = tm(T1, 2.1e2, 1.2);
    ln.ls = {p};
    sc.lines = {ln};
    sc.f_grid = linspace(99.0e9, 101.0e9, 81);
    scs.push_back(sc);
  }

  auto multi_perturber_lines = [&](double a_scale = 1.0) {
    std::vector<Line> lines;
    for (int i = 0; i < 3; ++i) {
      Line ln;
      ln.f0 = 183.31e9 + 2.0e9 * (i - 1);
      ln.a = a_scale * 1.0e-3 * (1 + i);
      ln.e0 = (2.0 + 0.8 * i) * 1e-21;
      ln.gu = 5 + 2 * i; ln.gl = 3 + 2 * i;
      ln.mass = 18.0105646863; ln.ratio = 0.997317;
      ln.spec_idx = 0; ln.iso_idx = i % 2;
      Perturber self; self.spec = 0;
      self.v[G0] = tm(T1, 1.1e5, 0.85);
      self.v[D0] = tm(T3, -3.0e2, 1.4);
      Perturber o2; o2.spec = 1;
      o2.v[G0] = tm(T4, 2.2e4, 4.0e3, 0.7);
      o2.v[D0] = tm(T1, 1.5e2, 0.9);
      o2.v[Y] = tm(T1, 1.0e-7, 1.0);
      Perturber bath; bath.spec = SPEC_BATH;
      bath.v[G0] = tm(DPL, 2.6e4, 0.76, -1.0e3, 1.9);
      bath.v[D0] = tm(T5, 1.2e2, 0.5);
      bath.v[Y] = tm(T1, -8.0e-8, 0.8);
      bath.v[G] = tm(T1, 2.0e-12, 1.6);
      bath.v[DV] = tm(T1, 1.0e-6, 1.1);
      ln.ls = {self, o2, bath};
      lines.push_back(ln);
    }
    return lines;
  };

  {  // 2. Multi-perturber mixing with Bath + first-order line mixing (Y,G,DV)
    Scenario sc;
    sc.name = "multi_perturber";
    sc.T = 275.0; sc.P = 8.0e4; sc.vmr = vmr3; sc.pf = pf2;
    sc.lines = multi_perturber_lines();
    sc.f_grid = linspace(180.0e9, 187.0e9, 141);
    scs.push_back(sc);
  }

  {  // 3. ByLine cutoff: window masking + shape-at-cutoff subtraction
    Scenario sc;
    sc.name = "cutoff_byline";
    sc.T = 230.0; sc.P = 3.0e4; sc.vmr = vmr3; sc.pf = pf2;
    for (int i = 0; i < 12; ++i) {
      Line ln;
      ln.f0 = 60.0e9 + 20.0e9 * i;
      ln.a = 8.0e-5 + 1.0e-5 * i;
      ln.e0 = (1.0 + 0.3 * i) * 1e-21;
      ln.gu = 3 + 2 * (i % 5); ln.gl = 1 + 2 * (i % 5);
      ln.mass = 31.98983; ln.ratio = 0.995;
      ln.spec_idx = 1; ln.iso_idx = 1;
      ln.cutoff = 37.0e9;  // window edges land inside the grid
      Perturber self; self.spec = 1;
      self.v[G0] = tm(T1, 1.3e4, 0.76);
      self.v[D0] = tm(T1, -9.0e1, 0.8);
      Perturber bath; bath.spec = SPEC_BATH;
      bath.v[G0] = tm(T1, 1.9e4, 0.7);
      ln.ls = {self, bath};
      sc.lines.push_back(ln);
    }
    sc.f_grid = linspace(40.0e9, 330.0e9, 233);
    scs.push_back(sc);
  }

  {  // 4. Mirrored shape at low frequency (VP_LTE_MIRROR)
    Scenario sc;
    sc.name = "mirrored";
    sc.T = 296.0; sc.P = 1.0e5; sc.vmr = vmr3; sc.pf = pf2;
    sc.mirrored = true;
    for (int i = 0; i < 3; ++i) {
      Line ln;
      ln.f0 = 22.235e9 + 3.0e9 * i;
      ln.a = 7.0e-6 * (i + 1);
      ln.e0 = 0.9e-21 * (i + 1);
      ln.gu = 5; ln.gl = 3;
      ln.mass = 18.0105646863; ln.ratio = 0.997317;
      ln.spec_idx = 0; ln.iso_idx = 0;
      Perturber bath; bath.spec = SPEC_BATH;
      bath.v[G0] = tm(T1, 9.0e4, 0.64);
      bath.v[D0] = tm(T1, 2.0e2, 0.7);
      ln.ls = {bath};
      sc.lines.push_back(ln);
    }
    sc.f_grid = linspace(1.0e9, 60.0e9, 119);
    scs.push_back(sc);
  }

  {  // 5. Temperature-law zoo: one line per law family driving G0
    Scenario sc;
    sc.name = "law_zoo";
    sc.T = 260.0; sc.P = 6.0e4; sc.vmr = vmr3; sc.pf = pf2;
    const TModel g0s[6] = {
        tm(T2, 2.4e4, 0.7, 0.3),
        tm(T3, 2.0e4, 5.0e1),
        tm(T5, 2.8e4, 0.45),
        tm(AER, 2.0e4, 2.3e4, 2.6e4, 2.9e4),
        tm(POLY, 5.0e3, 8.0e1, -9.0e-2, 1.1e-4),
        tm(T0, 2.5e4),
    };
    const TModel d0s[6] = {
        tm(T0, 1.0e2), tm(T1, -2.0e2, 0.9), tm(T2, 1.5e2, 1.1, -0.2),
        tm(DPL, 1.0e2, 0.8, 5.0e1, 1.5), tm(T4, 8.0e1, 3.0e1, 0.6),
        tm(T5, 1.1e2, 0.3),
    };
    for (int i = 0; i < 6; ++i) {
      Line ln;
      ln.f0 = 118.75e9 + 5.0e9 * (i - 3);
      ln.a = 4.0e-5;
      ln.e0 = 1.5e-21;
      ln.gu = 7; ln.gl = 5;
      ln.mass = 31.98983; ln.ratio = 0.995;
      ln.spec_idx = 1; ln.iso_idx = 1;
      Perturber bath; bath.spec = SPEC_BATH;
      bath.v[G0] = g0s[i];
      bath.v[D0] = d0s[i];
      ln.ls = {bath};
      sc.lines.push_back(ln);
    }
    sc.f_grid = linspace(100.0e9, 137.0e9, 149);
    scs.push_back(sc);
  }

  // 6/7. multi_perturber at T +/- 0.5 K -> central-difference dalpha/dT
  // (the reference's derivative-test methodology:
  //  tests/core/lbl/voigt_derivatives_perturbed.py)
  for (int sgn : {-1, +1}) {
    Scenario sc;
    sc.name = sgn < 0 ? "multi_perturber_tm" : "multi_perturber_tp";
    sc.T = 275.0 + 0.5 * sgn; sc.P = 8.0e4; sc.vmr = vmr3; sc.pf = pf2;
    sc.lines = multi_perturber_lines();
    sc.f_grid = linspace(180.0e9, 187.0e9, 141);
    scs.push_back(sc);
  }

  printf("{\n");
  for (auto& sc : scs) {
    auto alpha = absorption(sc.lines, sc.pf, sc.T, sc.P, sc.vmr, sc.f_grid,
                            sc.mirrored);
    emit_scenario(sc, alpha, false);
  }

  // 8. Full clear-sky radiance through a 41-level atmosphere
  // (simulate_clearsky parity: downlooking from 40 km, blackbody surface)
  {
    Scenario sc;
    sc.name = "radiance_clearsky";
    sc.P = 0; sc.T = 0;
    sc.vmr = vmr3; sc.pf = pf2;
    // weak lines: total nadir optical depth O(1) so the radiance golden
    // exercises the full layer recursion, not just saturation at TOA
    sc.lines = multi_perturber_lines(2.0e-5);
    sc.f_grid = linspace(180.0e9, 187.0e9, 71);
    const int nlev = 41;
    const double t_surf = 288.0;
    std::vector<double> z(nlev), Tz(nlev), Pz(nlev);
    for (int i = 0; i < nlev; ++i) {
      z[i] = 1000.0 * i;
      Tz[i] = std::max(288.0 - 6.5e-3 * z[i], 216.65);
      Pz[i] = 101325.0 * std::exp(-z[i] / 7000.0);
    }
    // observer at TOA looking down: path_alt = z reversed, background surface
    const size_t nf = sc.f_grid.size();
    std::vector<std::vector<double>> k(nlev), J(nlev);
    for (int i = 0; i < nlev; ++i) {
      const int lev = nlev - 1 - i;  // path point i is level nlev-1-i
      k[i] = absorption(sc.lines, sc.pf, Tz[lev], Pz[lev], sc.vmr, sc.f_grid,
                        false);
      J[i].resize(nf);
      for (size_t j = 0; j < nf; ++j) J[i][j] = planck(sc.f_grid[j], Tz[lev]);
    }
    std::vector<double> dr(nlev - 1, 1000.0);
    std::vector<double> I0(nf);
    for (size_t j = 0; j < nf; ++j) I0[j] = planck(sc.f_grid[j], t_surf);
    auto I = radiance(k, J, dr, I0);

    printf("  \"radiance_clearsky\": {\n");
    printf("    \"t_surf\": %.17g, \"mirrored\": false,\n", t_surf);
    printf("    \"vmr\": ");
    emit_array(sc.vmr);
    printf(",\n    \"q_coeffs\": [");
    for (size_t i = 0; i < sc.pf.coeffs.size(); ++i) {
      if (i) printf(",");
      emit_array(sc.pf.coeffs[i]);
    }
    printf("],\n    \"f_grid\": ");
    emit_array(sc.f_grid);
    printf(",\n    \"z\": ");
    emit_array(z);
    printf(",\n    \"t_profile\": ");
    emit_array(Tz);
    printf(",\n    \"p_profile\": ");
    emit_array(Pz);
    printf(",\n    \"lines\": [\n");
    for (size_t i = 0; i < sc.lines.size(); ++i)
      emit_line(sc.lines[i], i + 1 == sc.lines.size());
    printf("    ],\n    \"radiance\": ");
    emit_array(I);
    printf("\n  }\n");
  }

  printf("}\n");
  return 0;
}
