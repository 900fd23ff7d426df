// Standalone golden generator for predefined continuum/absorption models.
//
// Purpose: anchor arts_tpu/predefined (MPM2020 O2, ELL07 liquid cloud,
// MT_CKD 3.50 H2O self/foreign continua) to the reference implementation's
// numbers (m-brath/arts, arts3-dev).  Every function below is transcribed
// 1:1 from /root/reference/src/core/predefined/{MPM2020,ELL07,CKDMT350}.cc
// with file:line citations; the AER tables in ckdmt350_data.inc are the
// reference's own compiled-in data (CKDMT350.cc:48-914).
//
// Build + regenerate:
//   g++ -O2 -std=c++17 gen_predef_goldens.cpp -o /tmp/gen_predef_goldens
//   /tmp/gen_predef_goldens > ../../tests/goldens/predef_goldens.json
//
// Consumed by tests/test_predef_goldens.py.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdio>
#include <vector>

#include "ckdmt350_data.inc"

static constexpr double c_light = 299792458.0;
static const double log10_euler = std::log10(std::exp(1.0));

// ---------------------------------------------------------------------------
// MPM2020 (MPM2020.cc:16-149)
// ---------------------------------------------------------------------------
namespace mpm2020 {
constexpr int num = 38;
// line data tables (MPM2020.cc:47-113)
static const double C0[num] = {
    940.3,  543.4,  1503.0, 1442.1, 2103.4, 2090.7, 2379.9, 2438.0,
    2363.7, 2479.5, 2120.1, 2275.9, 1746.6, 1915.4, 1331.8, 1490.2,
    945.3,  1078.0, 627.1,  728.7,  389.7,  461.3,  227.3,  274.0,
    124.6,  153.0,  64.29,  80.40,  31.24,  39.80,  14.32,  18.56,
    6.193,  8.172,  2.529,  3.397,  0.975,  1.334};
static const double A2[num] = {
    0.01,  0.014, 0.083, 0.083, 0.207, 0.207, 0.387, 0.386, 0.621, 0.621,
    0.910, 0.910, 1.255, 1.255, 1.654, 1.654, 2.109, 2.108, 2.618, 2.617,
    3.182, 3.181, 3.800, 3.800, 4.474, 4.473, 5.201, 5.200, 5.983, 5.982,
    6.819, 6.818, 7.709, 7.708, 8.653, 8.652, 9.651, 9.650};
static const double GA0[num] = {
    1.685, 1.703, 1.513, 1.495, 1.433, 1.408, 1.353, 1.353, 1.303, 1.319,
    1.262, 1.265, 1.238, 1.217, 1.207, 1.207, 1.137, 1.137, 1.101, 1.101,
    1.037, 1.038, 0.996, 0.996, 0.955, 0.955, 0.906, 0.906, 0.858, 0.858,
    0.811, 0.811, 0.764, 0.764, 0.717, 0.717, 0.669, 0.669};
static const double Y0[num] = {
    -0.041, 0.277,  -0.372, 0.559,  -0.573, 0.618,  -0.366, 0.278,
    -0.089, -0.021, 0.060,  -0.152, 0.216,  -0.293, 0.373,  -0.436,
    0.491,  -0.542, 0.571,  -0.613, 0.636,  -0.670, 0.690,  -0.718,
    0.740,  -0.763, 0.788,  -0.807, 0.834,  -0.849, 0.876,  -0.887,
    0.915,  -0.922, 0.950,  -0.955, 0.987,  -0.988};
static const double Y1[num] = {
    0.0,   0.124,  -0.002, 0.008,  0.045, -0.093, 0.264, -0.351,
    0.359, -0.416, 0.326,  -0.353, 0.484, -0.503, 0.579, -0.590,
    0.616, -0.619, 0.611,  -0.609, 0.574, -0.568, 0.574, -0.566,
    0.60,  -0.59,  0.63,   -0.62,  0.64,  -0.63,  0.65,  -0.64,
    0.65,  -0.64,  0.65,   -0.64,  0.64,  -0.62};
static const double G0[num] = {
    -0.000695, -0.090, -0.103, -0.239, -0.172, -0.171, 0.028,  0.150,
    0.132,     0.170,  0.087,  0.069,  0.083,  0.067,  0.007,  0.016,
    -0.021,    -0.066, -0.095, -0.115, -0.118, -0.140, -0.173, -0.186,
    -0.217,    -0.227, -0.234, -0.242, -0.266, -0.272, -0.301, -0.304,
    -0.334,    -0.333, -0.361, -0.358, -0.348, -0.344};
static const double G1[num] = {
    0.,     -0.045, 0.007,  0.033,  0.081,  0.162,  0.179,  0.225,
    0.054,  0.003,  0.0004, -0.047, -0.034, -0.071, -0.180, -0.210,
    -0.285, -0.323, -0.363, -0.380, -0.378, -0.387, -0.392, -0.394,
    -0.424, -0.422, -0.465, -0.46,  -0.51,  -0.50,  -0.55,  -0.54,
    -0.58,  -0.56,  -0.62,  -0.59,  -0.68,  -0.65};
static const double DV0[num] = {
    -0.00028, 0.00597, -0.0195, 0.032,   -0.0475, 0.0541,  -0.0232, 0.0154,
    0.0007,   -0.0084, -0.0025, -0.0014, -0.0004, -0.0020, 0.005,   -0.0066,
    0.0072,   -0.008,  0.0064,  -0.0070, 0.0056,  -0.0060, 0.0047,  -0.0049,
    0.0040,   -0.0041, 0.0036,  -0.0037, 0.0033,  -0.0034, 0.0032,  -0.0032,
    0.0030,   -0.0030, 0.0028,  -0.0029, 0.0029,  -0.0029};
static const double DV1[num] = {
    -0.00039, 0.009,   -0.012, 0.016,   -0.027, 0.029,   0.006,  -0.015,
    0.010,    -0.014,  -0.013, 0.013,   0.004,  -0.005,  0.010,  -0.010,
    0.010,    -0.011,  0.008,  -0.009,  0.003,  -0.003,  0.0009, -0.0009,
    0.0017,   -0.0016, 0.0024, -0.0023, 0.0024, -0.0024, 0.0024, -0.0020,
    0.0017,   -0.0016, 0.0013, -0.0012, 0.0005, -0.0004};
static const double F0[num] = {
    118.750334, 56.264774, 62.486253, 58.446588, 60.306056, 59.590983,
    59.164204,  60.434778, 58.323877, 61.150562, 57.612486, 61.800158,
    56.968211,  62.411220, 56.363399, 62.997984, 55.783815, 63.568526,
    55.221384,  64.127775, 54.671180, 64.678910, 54.130025, 65.224078,
    53.595775,  65.764779, 53.066934, 66.302096, 52.542418, 66.836834,
    52.021429,  67.369601, 51.503360, 67.900868, 50.987745, 68.431006,
    50.474214,  68.960312};

// compute (MPM2020.cc:38-149)
void compute(std::vector<double>& alpha, const std::vector<double>& f_hz,
             double t, double p_pa, double o2vmr) {
  double c[num], ga[num], y[num], g[num], dv[num];
  const double x = 0.754;                       // :116
  const double p = p_pa * 1e-5;                 // pa2bar
  const double theta = 300.0 / t;
  const double dt = theta - 1.0;
  const double tadapt = std::pow(theta, x);
  for (int i = 0; i < num; i++) {               // :120-140 transforms
    y[i] = (Y0[i] + Y1[i] * dt) * (tadapt * p);
    g[i] = (G0[i] + G1[i] * dt) * (tadapt * p) * (tadapt * p);
    dv[i] = (DV0[i] + DV1[i] * dt) * (tadapt * p) * (tadapt * p);
    ga[i] = GA0[i] * (tadapt * p);
    c[i] = (C0[i] / F0[i]) * (theta * theta * theta * p) *
           std::exp(-A2[i] * dt);
  }
  const double conv = 0.1820 * 1e-7 / (2.0946 * log10_euler);  // :115
  for (size_t iv = 0; iv < f_hz.size(); iv++) {
    const double f = f_hz[iv] * 1e-9;  // hz2ghz
    double a = 0;                       // sum_lines (:19-35)
    for (int i = 0; i < num; i++) {
      const double dm = f - F0[i] - dv[i];
      const double dp = f + F0[i] + dv[i];
      a += c[i] * ((ga[i] * (1 + g[i]) + y[i] * dm) / (ga[i] * ga[i] + dm * dm) +
                   (ga[i] * (1 + g[i]) - y[i] * dp) / (ga[i] * ga[i] + dp * dp));
    }
    alpha[iv] = (a > 0) ? conv * o2vmr * f * f * a : 0.0;  // :144-147
  }
}
}  // namespace mpm2020

// ---------------------------------------------------------------------------
// ELL07 (ELL07.cc:38-198)
// ---------------------------------------------------------------------------
namespace ell07 {
void compute(std::vector<double>& alpha, const std::vector<double>& f_hz,
             double t, double lwc) {
  const double pi = M_PI, two_pi = 2 * M_PI;
  const double dB_km_to_1_m = 1e-3 / (10.0 * log10_euler);
  const double m = 1.00e3;
  // table 2 of Ellison (2007) (ELL07.cc:64-95)
  const double a1 = 79.23882, a2 = 3.815866, a3 = 1.634967, tc = 133.1383;
  const double b1 = 0.004300598, b2 = 0.01117295, b3 = 0.006841548;
  const double c1 = 1.382264e-13, c2 = 3.510354e-16, c3 = 6.30035e-15;
  const double d1 = 652.7648, d2 = 1249.533, d3 = 405.5169;
  const double p0 = 0.8379692, p1 = -0.006118594, p2 = -0.000012936798;
  const double p3 = 4235901000000.0, p4 = -14260880000.0, p5 = 273815700.0;
  const double p6 = -1246943.0, p7 = 9.618642e-14, p8 = 1.795786e-16;
  const double p9 = -9.310017E-18, p10 = 1.655473e-19, p11 = 0.6165532;
  const double p12 = 0.007238532, p13 = -0.00009523366;
  const double p14 = 15983170000000.0, p15 = -74413570000.0,
               p16 = 497448000.0, p17 = 2.882476e-14, p18 = -3.142118e-16,
               p19 = 3.528051e-18;
  const double t_cels = t - 273.15;  // :119-145
  const double eps_s = 87.9144 - 0.404399 * t_cels -
                       9.58726e-4 * t_cels * t_cels -
                       1.32802e-6 * t_cels * t_cels * t_cels;
  const double delta1 = a1 * std::exp(-b1 * t_cels);
  const double delta2 = a2 * std::exp(-b2 * t_cels);
  const double delta3 = a3 * std::exp(-b3 * t_cels);
  const double tau1 = c1 * std::exp(d1 / (t_cels + tc));
  const double tau2 = c2 * std::exp(d2 / (t_cels + tc));
  const double tau3 = c3 * std::exp(d3 / (t_cels + tc));
  const double delta4 = p0 + p1 * t_cels + p2 * t_cels * t_cels;
  const double f0 = p3 + p4 * t_cels + p5 * t_cels * t_cels +
                    p6 * t_cels * t_cels * t_cels;
  const double tau4 = p7 + p8 * t_cels + p9 * t_cels * t_cels +
                      p10 * t_cels * t_cels * t_cels;
  const double delta5 = p11 + p12 * t_cels + p13 * t_cels * t_cels;
  const double f1 = p14 + p15 * t_cels + p16 * t_cels * t_cels;
  const double tau5 = p17 + p18 * t_cels + p19 * t_cels * t_cels;
  auto pow2 = [](double v) { return v * v; };
  for (size_t s = 0; s < f_hz.size(); s++) {  // :147-196
    const double fg = f_hz[s];
    const double Reepsilon =
        eps_s -
        pow2(two_pi * fg) *
            (pow2(tau1) * delta1 / (1. + pow2(two_pi * fg * tau1)) +
             pow2(tau2) * delta2 / (1. + pow2(two_pi * fg * tau2)) +
             pow2(tau3) * delta3 / (1. + pow2(two_pi * fg * tau3))) -
        pow2(two_pi * tau4) * delta4 / 2. *
            (fg * (f0 + fg) / (1. + pow2(two_pi * tau4 * (f0 + fg))) -
             fg * (f0 - fg) / (1. + pow2(two_pi * tau4 * (f0 - fg)))) -
        pow2(two_pi * tau5) * delta5 / 2. *
            (fg * (f1 + fg) / (1. + pow2(two_pi * tau5 * (f1 + fg))) -
             fg * (f1 - fg) / (1. + pow2(two_pi * tau5 * (f1 - fg))));
    const double Imepsilon =
        two_pi * fg *
            (tau1 * delta1 / (1. + pow2(two_pi * fg * tau1)) +
             tau2 * delta2 / (1. + pow2(two_pi * fg * tau2)) +
             tau3 * delta3 / (1. + pow2(two_pi * fg * tau3))) +
        pi * fg * tau4 * delta4 *
            (1. / (1. + pow2(two_pi * tau4 * (f0 + fg))) +
             1. / (1. + pow2(two_pi * tau4 * (f0 - fg)))) +
        pi * fg * tau5 * delta5 *
            (1. / (1. + pow2(two_pi * tau5 * (f1 + fg))) +
             1. / (1. + pow2(two_pi * tau5 * (f1 - fg))));
    const double ImNw =
        1.500 / m * (3.000 * Imepsilon /
                     (pow2(Reepsilon + 2.000) + pow2(Imepsilon)));
    alpha[s] = lwc * 1.000e6 * dB_km_to_1_m * 0.1820 * (fg * 1e-9) * ImNw;
  }
}
}  // namespace ell07

// ---------------------------------------------------------------------------
// CKDMT350 (CKDMT350.cc:916-1270); data tables in ckdmt350_data.inc
// ---------------------------------------------------------------------------
namespace ckdmt350 {
constexpr double xLosmt = 2.68675e19, TO = 296.0, T1 = 273.0, PO = 1013.0;
constexpr double V1TAB = -20.0, DVTAB = 10.0;
constexpr int NPT = 2003;

double RADFN_FUN(double XVI, double XKT) {  // :916-962
  if (XKT > 0.0) {
    const double XVIOKT = XVI / XKT;
    if (XVIOKT <= 0.01) return 0.5 * XVIOKT * XVI;
    if (XVIOKT <= 10) {
      const double EXPVKT = std::expm1(-XVIOKT);
      return -XVI * EXPVKT / (2 + EXPVKT);
    }
    return XVI;
  }
  return XVI;
}

double XINT_FUN(double V1A, double DVA, const std::vector<double>& A,
                double VI) {  // :964-993
  const double ONEPL = 1.001;
  const double RECDVA = 1.0 / DVA;
  const int J = (int)((VI - V1A) * RECDVA + ONEPL);
  const double VJ = V1A + DVA * (double)(J - 1);
  const double P = RECDVA * (VI - VJ);
  const double C = (3.0 - 2.0 * P) * P * P;
  const double B = 0.5 * P * (1.0 - P);
  const double B1 = B * (1.0 - P);
  const double B2 = B * P;
  if (J - 1 > 0 && J + 2 < (int)A.size())
    return -A[J - 1] * B1 + A[J] * (1.0 - C + B2) + A[J + 1] * (C + B1) -
           A[J + 2] * B2;
  return 0.0;
}

// compute_self_h2o (:1031-1120)
void self_h2o(std::vector<double>& alpha, const std::vector<double>& f_hz,
              double T, double P, double vmrh2o) {
  const int nf = (int)f_hz.size();
  auto freq2kaycm = [](double f) { return f / (100.0 * c_light); };
  const double V1ABS = freq2kaycm(f_hz[0]);
  const double V2ABS = freq2kaycm(f_hz[nf - 1]);
  const double DVC = DVTAB;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - V1TAB) / DVTAB);
  if (V1C < V1TAB) I1 = -1;
  V1C = V1TAB + DVTAB * (double)(I1 - 1);
  const int I2 = (int)((V2C - V1TAB) / DVTAB);
  int NPTC = I2 - I1 + 3;
  if (NPTC > NPT) NPTC = NPT + 4;
  V2C = V1C + DVTAB * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> SH2OT0(NPTC + 1, 0.), SH2OT1(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + (J - 1);
    if ((I > 0) && (I <= NPT)) {
      SH2OT0[J] = SL296[I];
      SH2OT1[J] = SL260[I];
    }
  }
  const double Pave = P * 1e-2;
  const double Patm = Pave / PO;
  const double Rh2o = vmrh2o * Patm * (TO / T);
  const double Tfac = (T - TO) / (260.0 - TO);
  const double WTOT = xLosmt * (Pave / 1.013e3) * (2.73e2 / T);
  const double W1 = vmrh2o * WTOT;
  const double XKT = T / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double SH2O = 0.0;
    if (SH2OT0[J] > 0.0)
      SH2O = SH2OT0[J] * std::pow(SH2OT1[J] / SH2OT0[J], Tfac);
    k[J] = W1 * Rh2o * (SH2O * 1e-20) * RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = freq2kaycm(f_hz[s]);
    if ((V > 0.0) && (V < 20000.0))
      alpha[s] = 1e2 * XINT_FUN(V1C, DVC, k, V);
  }
}

// compute_foreign_h2o (:1149-1269)
void foreign_h2o(std::vector<double>& alpha, const std::vector<double>& f_hz,
                 double T, double P, double vmrh2o) {
  static const double XFAC_RHU[] = {  // :1167-1175
      0.7620, 0.7840, 0.7820, 0.7840, 0.7620, 0.7410, 0.7970, 0.9140, 0.9980,
      0.9830, 0.9330, 0.8850, 0.8420, 0.8070, 0.8000, 0.8010, 0.8100, 0.8090,
      0.8320, 0.8180, 0.7970, 0.8240, 0.8640, 0.8830, 0.8830, 0.8470, 0.8380,
      0.8660, 0.9410, 1.0400, 1.0680, 1.1410, 1.0800, 1.0340, 1.1550, 1.0990,
      1.0270, 0.9500, 0.8950, 0.8150, 0.7830, 0.7700, 0.7000, 0.7650, 0.7750,
      0.8500, 0.9000, 0.9050, 0.9540, 1.0200, 1.0200, 1.0250, 1.0200, 1.1000,
      1.1250, 1.1200, 1.1110, 1.1370, 1.1600, 1.1490, 1.1070, 1.0640, 1.0450};
  const int nf = (int)f_hz.size();
  auto freq2kaycm = [](double f) { return f / (100.0 * c_light); };
  const double V1ABS = freq2kaycm(f_hz[0]);
  const double V2ABS = freq2kaycm(f_hz[nf - 1]);
  const double DVC = DVTAB;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - V1TAB) / DVTAB);
  if (V1C < V1TAB) I1 = -1;
  V1C = V1TAB + DVTAB * (double)(I1 - 1);
  const int I2 = (int)((V2C - V1TAB) / DVTAB);
  int NPTC = I2 - I1 + 3;
  if (NPTC > NPT) NPTC = NPT + 4;
  V2C = V1C + DVTAB * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> FH2OT0(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + (J - 1);
    if ((I > 0) && (I <= NPT)) FH2OT0[J] = FH2O[I];
  }
  const double Pave = P * 1e-2;
  const double PFRGN = (Pave / PO) * (1.0 - vmrh2o);
  const double RFRGN = PFRGN * (TO / T);
  const double WTOT = xLosmt * (Pave / PO) * (T1 / T);
  const double W1 = vmrh2o * WTOT;
  const double XKT = T / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double FSCAL;
    if (VJ < 600.0) {  // :1230-1235
      const int JFAC = (int)((VJ + 10.0) / 10.0 + 0.00001);
      FSCAL = XFAC_RHU[JFAC + 1];
    } else {  // :1236-1252
      const double VDELSQ1 = std::pow(VJ - 255.67, 2.0);
      const double VDELmSQ1 = std::pow(VJ + 255.67, 2.0);
      const double VF1 = std::pow((VJ - 255.67) / 57.83, 8.0);
      const double VmF1 = std::pow((VJ + 255.67) / 57.83, 8.0);
      const double VF2 = std::pow(VJ / 630.0, 8.0);
      FSCAL = 1.0 + (0.06 + (-0.42) * (57600.0 / (VDELSQ1 + 57600.0 + VF1) +
                                       57600.0 / (VDELmSQ1 + 57600.0 + VmF1))) /
                        (1.0 + 0.3 * VF2);
    }
    k[J] = W1 * RFRGN * (FH2OT0[J] * FSCAL * 1e-20) * RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = freq2kaycm(f_hz[s]);
    if ((V >= 0.0) && (V < 20000.0))
      alpha[s] = 1e2 * XINT_FUN(V1C, DVC, k, V);
  }
}
}  // namespace ckdmt350

// ---------------------------------------------------------------------------
static void emit(const char* name, const std::vector<double>& f,
                 double t, double p, double vmr,
                 const std::vector<double>& alpha, bool& first) {
  if (!first) printf(",\n");
  first = false;
  printf("  {\"model\": \"%s\", \"t\": %.17g, \"p\": %.17g, \"vmr\": %.17g,\n",
         name, t, p, vmr);
  printf("   \"f_hz\": [");
  for (size_t i = 0; i < f.size(); i++)
    printf("%s%.17g", i ? ", " : "", f[i]);
  printf("],\n   \"alpha\": [");
  for (size_t i = 0; i < alpha.size(); i++)
    printf("%s%.17g", i ? ", " : "", alpha[i]);
  printf("]}");
}

int main() {
  printf("{\"configs\": [\n");
  bool first = true;

  // MPM2020: in-band + wings, three (T, P) states
  {
    std::vector<double> f;
    for (int i = 0; i < 40; i++) f.push_back(40e9 + i * 2.1e9);
    for (auto [t, p, x] : {std::array<double, 3>{296.0, 101325.0, 0.2095},
                           std::array<double, 3>{240.0, 2.5e4, 0.2095},
                           std::array<double, 3>{310.0, 8.0e4, 0.18}}) {
      std::vector<double> a(f.size(), 0.0);
      mpm2020::compute(a, f, t, p, x);
      emit("O2-MPM2020", f, t, p, x, a, first);
    }
  }

  // ELL07: microwave through sub-mm, warm + cold cloud
  {
    std::vector<double> f;
    for (int i = 0; i < 30; i++) f.push_back(5e9 + i * 30e9);
    for (auto [t, w] : {std::array<double, 2>{275.0, 5e-4},
                        std::array<double, 2>{300.0, 1e-3},
                        std::array<double, 2>{250.0, 1e-4}}) {
      std::vector<double> a(f.size(), 0.0);
      ell07::compute(a, f, t, w);
      emit("liquidcloud-ELL07", f, t, 0.0, w, a, first);
    }
  }

  // CKDMT350 self/foreign: microwave + IR window, wet/dry states
  {
    std::vector<double> f;
    for (int i = 0; i < 40; i++) f.push_back(10e9 + i * 14.9e12);
    for (auto [t, p, x] : {std::array<double, 3>{296.0, 101325.0, 0.02},
                           std::array<double, 3>{260.0, 5e4, 1e-3},
                           std::array<double, 3>{310.0, 9.5e4, 0.04}}) {
      std::vector<double> a1v(f.size(), 0.0), a2v(f.size(), 0.0);
      ckdmt350::self_h2o(a1v, f, t, p, x);
      ckdmt350::foreign_h2o(a2v, f, t, p, x);
      emit("H2O-SelfContCKDMT350", f, t, p, x, a1v, first);
      emit("H2O-ForeignContCKDMT350", f, t, p, x, a2v, first);
    }
  }

  printf("\n]}\n");
  return 0;
}
