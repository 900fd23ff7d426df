// Standalone golden generator for predefined continuum/absorption models.
//
// Purpose: anchor arts_tpu/predefined (MPM2020 O2, ELL07 liquid cloud,
// MT_CKD 3.50 H2O self/foreign continua) to the reference implementation's
// numbers (m-brath/arts, arts3-dev).  Every function below is transcribed
// 1:1 from /root/reference/src/core/predefined/{MPM2020,ELL07,CKDMT350}.cc
// with file:line citations; the AER tables in ckdmt350_data.inc are the
// reference's own compiled-in data (CKDMT350.cc:48-914).
//
// Build + regenerate (Faddeeva.cc provides erfcx for the PWR20xx
// speed-dependent Voigt lines, same linkage as the LBL harness):
//   g++ -O2 -std=c++17 -I /root/reference/3rdparty gen_predef_goldens.cpp \
//       /root/reference/3rdparty/Faddeeva/Faddeeva.cc -o /tmp/gen_predef_goldens
//   /tmp/gen_predef_goldens > ../../tests/goldens/predef_goldens.json
//
// Consumed by tests/test_predef_goldens.py.

#include <algorithm>
#include <array>
#include <cmath>
#include <complex>
#include <cstdio>
#include <vector>

#include <Faddeeva/Faddeeva.hh>

#include "ckdmt320_data.inc"
#include "ckdmt350_data.inc"
#include "mt_ckd_misc_data.inc"

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
// MPM89 (MPM89.cc:95-180 water, :270-411 oxygen)
// ---------------------------------------------------------------------------
namespace mpm89 {
// MPMLineShapeFunction (MPM89.cc:34-65): VVW with the (f/f0) factor
static double vvw_h2o(double gamma, double fl, double f) {
  const double f_minus = 1.0 / ((f - fl) * (f - fl) + gamma * gamma);
  const double f_plus = 1.0 / ((f + fl) * (f + fl) + gamma * gamma);
  return std::fabs(f / fl) * gamma * (f_minus + f_plus);
}
// MPMLineShapeO2Function (MPM89.cc:203-236): VVW with first-order mixing
static double vvw_o2(double gamma, double fl, double f, double delta) {
  const double f_minus =
      (gamma - delta * (fl - f)) / ((fl - f) * (fl - f) + gamma * gamma);
  const double f_plus =
      (gamma - delta * (fl + f)) / ((fl + f) * (fl + f) + gamma * gamma);
  return f * (f_minus + f_plus);
}

// line table (MPM89.cc:110-140): f0, b1..b6
static const double h2o_lines[30][7] = {
    {22.235080, 0.1090, 2.143, 28.11, 0.69, 4.80, 1.00},
    {67.813960, 0.0011, 8.735, 28.58, 0.69, 4.93, 0.82},
    {119.995940, 0.0007, 8.356, 29.48, 0.70, 4.78, 0.79},
    {183.310074, 2.3000, 0.668, 28.13, 0.64, 5.30, 0.85},
    {321.225644, 0.0464, 6.181, 23.03, 0.67, 4.69, 0.54},
    {325.152919, 1.5400, 1.540, 27.83, 0.68, 4.85, 0.74},
    {336.187000, 0.0010, 9.829, 26.93, 0.69, 4.74, 0.61},
    {380.197372, 11.9000, 1.048, 28.73, 0.69, 5.38, 0.84},
    {390.134508, 0.0044, 7.350, 21.52, 0.63, 4.81, 0.55},
    {437.346667, 0.0637, 5.050, 18.45, 0.60, 4.23, 0.48},
    {439.150812, 0.9210, 3.596, 21.00, 0.63, 4.29, 0.52},
    {443.018295, 0.1940, 5.050, 18.60, 0.60, 4.23, 0.50},
    {448.001075, 10.6000, 1.405, 26.32, 0.66, 4.84, 0.67},
    {470.888947, 0.3300, 3.599, 21.52, 0.66, 4.57, 0.65},
    {474.689127, 1.2800, 2.381, 23.55, 0.65, 4.65, 0.64},
    {488.491133, 0.2530, 2.853, 26.02, 0.69, 5.04, 0.72},
    {503.568532, 0.0374, 6.733, 16.12, 0.61, 3.98, 0.43},
    {504.482692, 0.0125, 6.733, 16.12, 0.61, 4.01, 0.45},
    {556.936002, 510.0000, 0.159, 32.10, 0.69, 4.11, 1.00},
    {620.700807, 5.0900, 2.200, 24.38, 0.71, 4.68, 0.68},
    {658.006500, 0.2740, 7.820, 32.10, 0.69, 4.14, 1.00},
    {752.033227, 250.0000, 0.396, 30.60, 0.68, 4.09, 0.84},
    {841.073593, 0.0130, 8.180, 15.90, 0.33, 5.76, 0.45},
    {859.865000, 0.1330, 7.989, 30.60, 0.68, 4.09, 0.84},
    {899.407000, 0.0550, 7.917, 29.85, 0.68, 4.53, 0.90},
    {902.555000, 0.0380, 8.432, 28.65, 0.70, 5.10, 0.95},
    {906.205524, 0.1830, 5.111, 24.08, 0.70, 4.70, 0.53},
    {916.171582, 8.5600, 1.442, 26.70, 0.70, 4.78, 0.78},
    {970.315022, 9.1600, 1.920, 25.50, 0.64, 4.94, 0.67},
    {987.926764, 138.0000, 0.258, 29.85, 0.68, 4.55, 0.90}};

// water (MPM89.cc:95-180)
void water(std::vector<double>& alpha, const std::vector<double>& f_hz,
           double t, double p_pa, double vmr) {
  const double dB_km_to_1_m = 1e-3 / (10.0 * log10_euler);
  const double pwv_dummy = 1e-3 * p_pa;
  const double theta = 300.0 / t;
  const double pwv = pwv_dummy * vmr;
  const double pda = pwv_dummy - pwv;
  const double Nppc = pwv_dummy * theta * theta * theta * 1.000e-5 *
                      ((0.113 * pda) + (3.57 * pwv * std::pow(theta, 7.5)));
  for (size_t s = 0; s < f_hz.size(); ++s) {
    const double ff = f_hz[s] * 1e-9;
    double Nppl = 0.0;
    for (const auto& l : h2o_lines) {
      const double strength = pwv_dummy * l[1] * std::pow(theta, 3.5) *
                              std::exp(l[2] * (1.000 - theta));
      const double gam =
          l[3] * 0.001 *
          (l[5] * pwv * std::pow(theta, l[6]) + pda * std::pow(theta, l[4]));
      Nppl += strength * vvw_h2o(gam, l[0], ff);
    }
    alpha[s] = vmr * dB_km_to_1_m * 0.1820 * ff * (Nppl + (Nppc * ff));
  }
}

// line table (MPM89.cc:288-333): f0, a1..a6
static const double o2_lines[44][7] = {
    {50.474238, 0.94, 9.694, 8.60, 0.0, 1.600, 5.520},
    {50.987749, 2.46, 8.694, 8.70, 0.0, 1.400, 5.520},
    {51.503350, 6.08, 7.744, 8.90, 0.0, 1.165, 5.520},
    {52.021410, 14.14, 6.844, 9.20, 0.0, 0.883, 5.520},
    {52.542394, 31.02, 6.004, 9.40, 0.0, 0.579, 5.520},
    {53.066907, 64.10, 5.224, 9.70, 0.0, 0.252, 5.520},
    {53.595749, 124.70, 4.484, 10.00, 0.0, -0.066, 5.520},
    {54.130000, 228.00, 3.814, 10.20, 0.0, -0.314, 5.520},
    {54.671159, 391.80, 3.194, 10.50, 0.0, -0.706, 5.520},
    {55.221367, 631.60, 2.624, 10.79, 0.0, -1.151, 5.514},
    {55.783802, 953.50, 2.119, 11.10, 0.0, -0.920, 5.025},
    {56.264775, 548.90, 0.015, 16.46, 0.0, 2.881, -0.069},
    {56.363389, 1344.00, 1.660, 11.44, 0.0, -0.596, 4.750},
    {56.968206, 1763.00, 1.260, 11.81, 0.0, -0.556, 4.104},
    {57.612484, 2141.00, 0.915, 12.21, 0.0, -2.414, 3.536},
    {58.323877, 2386.00, 0.626, 12.66, 0.0, -2.635, 2.686},
    {58.446590, 1457.00, 0.084, 14.49, 0.0, 6.848, -0.647},
    {59.164207, 2404.00, 0.391, 13.19, 0.0, -6.032, 1.858},
    {59.590983, 2112.00, 0.212, 13.60, 0.0, 8.266, -1.413},
    {60.306061, 2124.00, 0.212, 13.82, 0.0, -7.170, 0.916},
    {60.434776, 2461.00, 0.391, 12.97, 0.0, 5.664, -2.323},
    {61.150560, 2504.00, 0.626, 12.48, 0.0, 1.731, -3.039},
    {61.800154, 2298.00, 0.915, 12.07, 0.0, 1.738, -3.797},
    {62.411215, 1933.00, 1.260, 11.71, 0.0, -0.048, -4.277},
    {62.486260, 1517.00, 0.083, 14.68, 0.0, -4.290, 0.238},
    {62.997977, 1503.00, 1.665, 11.39, 0.0, 0.134, -4.860},
    {63.568518, 1087.00, 2.115, 11.08, 0.0, 0.541, -5.079},
    {64.127767, 733.50, 2.620, 10.78, 0.0, 0.814, -5.525},
    {64.678903, 463.50, 3.195, 10.50, 0.0, 0.415, -5.520},
    {65.224071, 274.80, 3.815, 10.20, 0.0, 0.069, -5.520},
    {65.764772, 153.00, 4.485, 10.00, 0.0, -0.143, -5.520},
    {66.302091, 80.09, 5.225, 9.70, 0.0, -0.428, -5.520},
    {66.836830, 39.46, 6.005, 9.40, 0.0, -0.726, -5.520},
    {67.369598, 18.32, 6.845, 9.20, 0.0, -1.002, -5.520},
    {67.900867, 8.01, 7.745, 8.90, 0.0, -1.255, -5.520},
    {68.431005, 3.30, 8.695, 8.70, 0.0, -1.500, -5.520},
    {68.960311, 1.28, 9.695, 8.60, 0.0, -1.700, -5.520},
    {118.750343, 945.00, 0.009, 16.30, 0.0, -0.247, 0.003},
    {368.498350, 67.90, 0.049, 19.20, 0.6, 0.000, 0.000},
    {424.763124, 638.00, 0.044, 19.16, 0.6, 0.000, 0.000},
    {487.249370, 235.00, 0.049, 19.20, 0.6, 0.000, 0.000},
    {715.393150, 99.60, 0.145, 18.10, 0.6, 0.000, 0.000},
    {773.839675, 671.00, 0.130, 18.10, 0.6, 0.000, 0.000},
    {834.145330, 180.00, 0.147, 18.10, 0.6, 0.000, 0.000}};

// oxygen (MPM89.cc:270-411)
void oxygen(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double vmr, double h2o) {
  const double dB_km_to_1_m = 1e-3 / (10.0 * log10_euler);
  const double S0 = 6.140e-4, G0 = 5.60e-3, X0 = 0.800;  // MPM92 continuum
  const double VMRISO = 0.2085;
  const double theta = 300.0 / t;
  const double pwv = 1e-3 * p_pa * h2o;
  const double pda = (1e-3 * p_pa) - pwv;
  const double pda_dummy = pda;
  const double strength_cont = S0 * pda_dummy * theta * theta;
  const double gam_cont = G0 * (pwv + pda) * std::pow(theta, X0);
  for (size_t s = 0; s < f_hz.size(); ++s) {
    const double ff = f_hz[s] * 1e-9;
    const double Nppc =
        strength_cont * ff * gam_cont / (ff * ff + gam_cont * gam_cont);
    double Nppl = 0.0;
    for (const auto& l : o2_lines) {
      const double strength = l[1] * 1.000e-6 * pda_dummy * theta * theta *
                              theta * std::exp(l[2] * (1.000 - theta)) / l[0];
      const double gam = l[3] * 1.000e-3 *
                         ((pda * std::pow(theta, 0.80 - l[4])) +
                          (1.10 * pwv * theta));
      const double delta =
          (l[5] + l[6] * theta) * 1.000e-3 * pda * std::pow(theta, 0.8);
      Nppl += strength * vvw_o2(gam, l[0], ff, delta);
    }
    alpha[s] = vmr * dB_km_to_1_m * 0.1820 * ff *
               (((Nppl < 0.000) ? 0.0 : Nppl) + Nppc) / VMRISO;
  }
}
}  // namespace mpm89

// ---------------------------------------------------------------------------
// MPM93 N2 continuum (MPM93.cc:33-73)
// ---------------------------------------------------------------------------
namespace mpm93 {
void nitrogen(std::vector<double>& alpha, const std::vector<double>& f_hz,
              double t, double p_pa, double n2, double h2o) {
  const double xT = 3.500, xf = 1.500;
  const double gxf = 9.000 * xf;
  const double S = 2.296e-31;
  const double G = 1.930e-5 * std::pow(10.000, -gxf);
  const double fac = 4.0 * M_PI / c_light;
  const double th = 300.0 / t;
  const double strength =
      S * std::pow(p_pa * (1.0000 - h2o), 2.0) * std::pow(th, xT);
  for (size_t s = 0; s < f_hz.size(); ++s)
    alpha[s] = n2 * fac * strength * std::pow(f_hz[s], 2.0) /
               (1.000 + G * std::pow(f_hz[s], xf)) * n2;
}
}  // namespace mpm93

// ---------------------------------------------------------------------------
// TRE05 O2 (TRE05.cc:115-296)
// ---------------------------------------------------------------------------
namespace tre05 {
static const double o2_lines[44][7] = {
    {50.474214, 0.975 / 10, 9.651, 0.669, 0.0, 0.2566, 0.685},
    {50.987745, 2.529 / 10, 8.653, 0.717, 0.0, 0.2246, 0.680},
    {51.503360, 6.193 / 10, 7.709, 0.764, 0.0, 0.1947, 0.6729},
    {52.021429, 14.32 / 10, 6.819, 0.811, 0.0, 0.1667, 0.6640},
    {52.542418, 31.24 / 10, 5.983, 0.858, 0.0, 0.1388, 0.6526},
    {53.066934, 64.29 / 10, 5.201, 0.906, 0.0, 0.1349, 0.6206},
    {53.595775, 124.6 / 10, 4.474, 0.955, 0.0, 0.2227, 0.5085},
    {54.130025, 227.3 / 10, 3.800, 0.996, 0.0, 0.3170, 0.3750},
    {54.671180, 389.7 / 10, 3.182, 1.037, 0.0, 0.3558, 0.2654},
    {55.221384, 627.1 / 10, 2.618, 1.089, 0.0, 0.2560, 0.2952},
    {55.783815, 945.3 / 10, 2.109, 1.134, 0.0, -0.1172, 0.6135},
    {56.264774, 543.4 / 10, 0.014, 1.703, 0.0, 0.3525, -0.0978},
    {56.363399, 1331.8 / 10, 1.654, 1.189, 0.0, -0.2378, 0.6547},
    {56.968211, 1746.6 / 10, 1.255, 1.223, 0.0, -0.3545, 0.6451},
    {57.612486, 2120.1 / 10, 0.910, 1.262, 0.0, -0.5416, 0.6056},
    {58.323877, 2363.7 / 10, 0.621, 1.295, 0.0, -0.1932, 0.0436},
    {58.446588, 1442.1 / 10, 0.083, 1.491, 0.0, 0.6768, -0.1273},
    {59.164204, 2379.9 / 10, 0.387, 1.353, 0.0, -0.6561, 0.2309},
    {59.590983, 2090.7 / 10, 0.207, 1.408, 0.0, 0.6957, -0.0776},
    {60.306056, 2103.4 / 10, 0.207, 1.415, 0.0, -0.6395, 0.0699},
    {60.434778, 2438.0 / 10, 0.386, 1.339, 0.0, 0.6342, -0.2825},
    {61.150562, 2479.5 / 10, 0.621, 1.292, 0.0, 0.1014, -0.0584},
    {61.800158, 2275.9 / 10, 0.910, 1.263, 0.0, 0.5014, -0.6619},
    {62.411220, 1915.4 / 10, 1.255, 1.217, 0.0, 0.3029, -0.6759},
    {62.486253, 1503.0 / 10, 0.083, 1.513, 0.0, -0.4499, 0.0844},
    {62.997984, 1490.2 / 10, 1.654, 1.174, 0.0, 0.1856, -0.6675},
    {63.568526, 1078.0 / 10, 2.108, 1.134, 0.0, 0.0658, -0.6139},
    {64.127775, 728.7 / 10, 2.617, 1.088, 0.0, -0.3036, -0.2895},
    {64.678910, 461.3 / 10, 3.181, 1.038, 0.0, -0.3968, -0.2590},
    {65.224078, 274.0 / 10, 3.800, 0.996, 0.0, -0.3528, -0.3680},
    {65.764779, 153.0 / 10, 4.473, 0.955, 0.0, -0.2548, -0.5002},
    {66.302096, 80.40 / 10, 5.200, 0.906, 0.0, -0.1660, -0.6091},
    {66.836834, 39.80 / 10, 5.982, 0.858, 0.0, -0.1680, -0.6393},
    {67.369601, 18.56 / 10, 6.818, 0.811, 0.0, -0.1956, -0.6475},
    {67.900868, 8.172 / 10, 7.708, 0.764, 0.0, -0.2216, -0.6545},
    {68.431006, 3.397 / 10, 8.652, 0.717, 0.0, -0.2492, -0.660},
    {68.960312, 1.334 / 10, 9.650, 0.669, 0.0, -0.2773, -0.665},
    {118.750334, 940.3 / 10, 0.010, 1.664, 0.0, -0.0439, 0.0079},
    {368.498246, 67.4 / 10, 0.048, 1.64, 0.0, 0.0, 0.0},
    {424.763020, 637.7 / 10, 0.044, 1.64, 0.0, 0.0, 0.0},
    {487.249273, 237.4 / 10, 0.049, 1.60, 0.0, 0.0, 0.0},
    {715.392902, 98.1 / 10, 0.145, 1.60, 0.0, 0.0, 0.0},
    {773.839490, 572.3 / 10, 0.141, 1.62, 0.0, 0.0, 0.0},
    {834.145546, 183.1 / 10, 0.145, 1.47, 0.0, 0.0, 0.0}};

void oxygen(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double vmr, double h2o) {
  const double VMRISO = 0.2085;
  const double S0 = 6.140e-5, G0 = 0.560e-3, X0 = 0.800;
  const double dB_km_to_1_m = 1.00000e-3 / (10.0 * log10_euler);
  const double theta = 300.0 / t;
  const double pwv = 1e-2 * p_pa * h2o;
  const double pda = (1e-2 * p_pa) - pwv;
  const double pda_dummy = pda;
  const double strength_cont = S0 * pda_dummy * std::pow(theta, 2.);
  const double gam_cont = G0 * (pwv + pda) * std::pow(theta, X0);
  for (size_t s = 0; s < f_hz.size(); ++s) {
    const double ff = f_hz[s] * 1e-9;
    const double Nppc = strength_cont * ff * gam_cont /
                        (std::pow(ff, 2.) + std::pow(gam_cont, 2.));
    double Nppl = 0.0;
    for (const auto& l : o2_lines) {
      const double strength = 1.000e-6 * pda_dummy * l[1] / l[0] *
                              std::pow(theta, 3.) * std::exp(l[2] * (1.0 - theta));
      const double gam =
          l[3] * 0.001 *
          ((pda * std::pow(theta, 0.8 - l[4])) + (1.10 * pwv * theta));
      const double delta =
          (l[5] + l[6] * theta) * (pda + pwv) * std::pow(theta, 0.8) * 0.001;
      Nppl += strength * mpm89::vvw_o2(gam, l[0], ff, delta);
    }
    if (Nppl < 0.000) Nppl = 0.0000;
    alpha[s] = vmr * dB_km_to_1_m * 0.1820 * ff * (Nppl + Nppc) / VMRISO;
  }
}
}  // namespace tre05

// ---------------------------------------------------------------------------
// CKDMT320 (CKDMT320.cc:1211-1389 self, :1392-1518 foreign); note the
// 3.20 conventions differ from 3.50: fill index I = I1 + J (:1275),
// NPTC clamp npt+1 (:1262), explicit self SFAC corrections
// (:1306-1321), XFAC_RHU[JFAC] without the +1 (:1460-1463)
// ---------------------------------------------------------------------------
namespace ckdmt320 {
constexpr double xLosmt = 2.68675e19, TO = 296.0, T1 = 273.0, PO = 1013.0;
constexpr double V1TAB = -20.0, DVTAB = 10.0;
constexpr int NPT = 2003;

void self_h2o(std::vector<double>& alpha, const std::vector<double>& f_hz,
              double T, double P, double vmrh2o) {
  static const double XFACREV[15] = {1.003, 1.009, 1.015, 1.023, 1.029,
                                     1.033, 1.037, 1.039, 1.040, 1.046,
                                     1.036, 1.027, 1.01,  1.002, 1.00};
  const int nf = (int)f_hz.size();
  auto freq2kaycm = [](double f) { return f / (100.0 * c_light); };
  const double V1ABS = freq2kaycm(f_hz[0]);
  const double V2ABS = freq2kaycm(f_hz[nf - 1]);
  const double DVC = DVTAB;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - V1TAB) / DVTAB);
  if (V1C < V1TAB) I1 = -1;
  V1C = V1TAB + DVTAB * (double)I1;
  const int I2 = (int)((V2C - V1TAB) / DVTAB);
  int NPTC = I2 - I1 + 3;
  if (NPTC > NPT) NPTC = NPT + 1;
  V2C = V1C + DVTAB * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> SH2OT0(NPTC + 1, 0.), SH2OT1(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J;
    if ((I > 0) && (I <= NPT)) {
      SH2OT0[J] = SL296_320[I];
      SH2OT1[J] = SL260_320[I];
    }
  }
  const double Pave = P * 1e-2;
  const double Patm = Pave / PO;
  const double Rh2o = Patm * (TO / T);
  const double Tfac = (T - TO) / (260.0 - TO);
  const double WTOT = xLosmt * (Pave / 1.013e3) * (2.73e2 / T);
  const double W1 = vmrh2o * WTOT;
  const double XKT = T / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double SH2O = 0.0;
    if (SH2OT0[J] > 0.0) {
      SH2O = SH2OT0[J] * std::pow(SH2OT1[J] / SH2OT0[J], Tfac);
      double SFAC = 1.0;
      if ((VJ >= 820.0) && (VJ <= 960.0)) {
        const int JFAC = (int)((VJ - 820.0) / 10.0 + 0.00001);
        if ((JFAC >= 0) && (JFAC <= 14)) SFAC = XFACREV[JFAC];
      }
      SFAC *= 1.0 + (0.25 / (1.0 + std::pow(VJ / 350.0, 6.0)));
      SFAC *= 1.0 + (0.08 / (1.0 + std::pow(VJ / 40.0, 6.0)));
      SH2O = SFAC * SH2O;
    }
    // note the extra vmrh2o factor: the 3.20 port multiplies k by the
    // vmr (cross section -> absorption), CKDMT320.cc:1328
    k[J] = vmrh2o * W1 * Rh2o * (SH2O * 1e-20) * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = freq2kaycm(f_hz[s]);
    if ((V > 0.0) && (V < 20000.0))
      alpha[s] = 1e2 * ckdmt350::XINT_FUN(V1C, DVC, k, V);
  }
}

void foreign_h2o(std::vector<double>& alpha, const std::vector<double>& f_hz,
                 double T, double P, double vmrh2o) {
  static const double XFAC_RHU[] = {
      0.7810, 0.8330, 0.8500, 0.8330, 0.7810, 0.7540, 0.8180, 0.9140, 0.9980,
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
  V1C = V1TAB + DVTAB * (double)I1;
  const int I2 = (int)((V2C - V1TAB) / DVTAB);
  int NPTC = I2 - I1 + 3;
  if (NPTC > NPT) NPTC = NPT + 1;
  V2C = V1C + DVTAB * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> FH2OT0(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J;
    if ((I > 0) && (I <= NPT)) FH2OT0[J] = FH2O_320[I];
  }
  const double Pave = P * 1e-2;
  const double PFRGN = (Pave / PO) * (1.0 - vmrh2o);
  const double RFRGN = PFRGN * (TO / T);
  const double WTOT = xLosmt * (Pave / PO) * (T1 / T);
  const double XKT = T / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double FSCAL;
    if (VJ < 600.0) {
      const int JFAC = (int)((VJ + 10.0) / 10.0 + 0.00001);
      FSCAL = XFAC_RHU[JFAC];
    } else {
      const double VDELSQ1 = std::pow(VJ - 255.67, 2.0);
      const double VDELmSQ1 = std::pow(VJ + 255.67, 2.0);
      const double VF1 = std::pow((VJ - 255.67) / 57.83, 8.0);
      const double VmF1 = std::pow((VJ + 255.67) / 57.83, 8.0);
      const double VF2 = std::pow(VJ / 630.0, 8.0);
      FSCAL = 1.0 + (0.06 + (-0.42) * (57600.0 / (VDELSQ1 + 57600.0 + VF1) +
                                       57600.0 / (VDELmSQ1 + 57600.0 + VmF1))) /
                        (1.0 + 0.3 * VF2);
    }
    const double FH2O = FH2OT0[J] * FSCAL;
    k[J] = vmrh2o * WTOT * RFRGN * (FH2O * 1e-20) *
           ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = freq2kaycm(f_hz[s]);
    if ((V >= 0.0) && (V < 20000.0))
      alpha[s] = 1e2 * ckdmt350::XINT_FUN(V1C, DVC, k, V);
  }
}
}  // namespace ckdmt320

// ---------------------------------------------------------------------------
// MT_CKD 2.52 band models (MT_CKD252.cc): CO2 continuum :89, O2 vis
// :1157, N2 CIA fundamental :1532, N2 CIA rotational :1762.  All use the
// port's cursor-lerp interpolation; RADFN shared with ckdmt350.
// ---------------------------------------------------------------------------
namespace mt_ckd252 {
constexpr double xLosmt = 2.686763e19, T1 = 273.0, TO = 296.0, PO = 1013.0;

static double lerp_out(const std::vector<double>& k, double V1C, double DVC,
                       double V) {
  // cursor interpolation (MT_CKD252.cc:1128-1135); k is the 1-based window
  double VJ = V1C;
  size_t J = 1;
  while (V > VJ) {
    VJ += DVC;
    J++;
  }
  if (J < k.size() - 1) {
    const double tt = 1. + (V - VJ) / DVC;  // std::lerp(k[J], k[J+1], tt)
    return k[J] + tt * (k[J + 1] - k[J]);
  }
  return 0.0;
}

// carbon_dioxide (MT_CKD252.cc:89-1156)
void co2(std::vector<double>& alpha, const std::vector<double>& f_hz,
         double t, double p_pa, double vmr) {
  constexpr double v1t = -4.0, dvt = 2.0;
  constexpr int npt = 5003;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = dvt;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - v1t) / dvt + 0.01);
  if (V1C < v1t) I1 = -1;
  V1C = v1t + dvt * (double)(I1 - 1);
  const int I2 = (int)((V2C - v1t) / dvt + 0.01);
  int NPTC = I2 - I1 + 3;
  if (NPTC > npt) NPTC = npt + 1;
  V2C = V1C + dvt * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> FCO2T0(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J - 2;
    if ((I >= 0) && (I < npt)) FCO2T0[J] = FCO2_252[I];
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double Rhoave = (Pave / PO) * (TO / Tave);
  const double WTOT = xLosmt * (Pave / PO) * (T1 / Tave);
  const double XKT = Tave / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double FCO2 = FCO2T0[J];
    const int I1J = I1 + J - 1;
    if ((I1J >= 1196) && (I1J <= 1220))
      FCO2 = std::pow(Tave / 246.0, TDEP_BANDHEAD[I1J - 1196]) * FCO2;
    if ((VJ > 2000.0) && (VJ < 2998.0)) {
      const int JFAC = (int)((VJ - 1998.0) / 2.0 + 0.00001);
      FCO2 = XFAC_CO2[JFAC - 1] * FCO2;
    }
    k[J] = WTOT * Rhoave * (FCO2 * 1e-20) * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > 0.0) && (V < v1t + dvt * (npt - 1)))
      alpha[s] = vmr * 1e2 * lerp_out(k, V1C, DVC, V);
  }
}

// oxygen_vis (MT_CKD252.cc:1157-1531)
void o2_vis(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double vmr) {
  constexpr double v1t = 15000.0, v2t = 29870.0, dvt = 10.0;
  constexpr int npt = 1488;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = dvt;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - v1t) / dvt + 0.01);
  if (V1C < v1t) I1 = I1 - 1;
  V1C = v1t + dvt * (double)(I1 - 1);
  const int I2 = (int)((V2C - v1t) / dvt + 0.01);
  const int NPTC = I2 - I1 + 3;
  V2C = V1C + dvt * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> CO(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J - 2;
    if ((I >= 0) && (I < npt)) {
      const double VJ = V1C + DVC * (double)(J - 1);
      CO[J] = O2_VIS_252[I] / VJ;
    }
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double WTOT = 1e-20 * xLosmt * (Pave / PO) * (T1 / Tave);
  const double XKT = Tave / 1.4387752;
  const double tau_fac = WTOT * (Pave / PO) * (T1 / Tave);
  const double factor =
      1.0 / (xLosmt * 1e-20 * std::pow(55.0 * 273.0 / 296.0, 2) * 89.5);
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    k[J] = CO[J] * factor * tau_fac * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > v1t) && (V < v2t))
      alpha[s] = vmr * 1e2 * lerp_out(k, V1C, DVC, V);
  }
}

// nitrogen_fun (MT_CKD252.cc:1532-1760)
void n2_fun(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double n2, double o2, double h2o) {
  constexpr double v1t = 2001.766357, v2t = 2710.45, dvt = 3.981461525;
  constexpr int npt = 179;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = dvt;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - v1t) / dvt + 0.01);
  if (V1C < v1t) I1 = -1;
  V1C = v1t + dvt * (double)(I1 - 1);
  const int I2 = (int)((V2C - v1t) / dvt + 0.01);
  int NPTC = I2 - I1 + 3;
  if (NPTC > npt) NPTC = npt + 1;
  V2C = V1C + dvt * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> xn2(NPTC + 1, 0.), xn2t(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J - 2;
    if ((I >= 0) && (I < npt)) {
      xn2[J] = N2F_252[I];
      xn2t[J] = N2FT_252[I];
    }
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double WTOT = xLosmt * (Pave / PO) * (T1 / Tave);
  const double tau_fac = WTOT * (Pave / PO) * (T1 / Tave);
  const double a_o2 = 1.294 - 0.4545 * Tave / 296.0;
  const double XKT = Tave / 1.4387752;
  const double xktfac =
      ((1.0 / Tave) - (1.0 / 272)) / ((1.0 / 228) - (1.0 / 272));
  const double xt_lin = (Tave - 272) / (228 - 272);
  const double factor = (1.0 / xLosmt) * (n2 + a_o2 * o2 + 1.0 * h2o);
  std::vector<double> k(NPTC + 2, 0.);
  double VJ = V1C - DVC;
  for (int J = 1; J <= NPTC; ++J) {
    VJ += DVC;
    double C0;
    if ((xn2[J] > 0.0) && (xn2t[J] > 0.0))
      C0 = factor * xn2[J] * std::pow(xn2t[J] / xn2[J], xktfac) / VJ;
    else
      C0 = factor * (xn2[J] + (xn2t[J] - xn2[J]) * xt_lin) / VJ;
    k[J] = tau_fac * C0 * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > v1t) && (V < v2t))
      alpha[s] = n2 * 1e2 * lerp_out(k, V1C, DVC, V);
  }
}

// nitrogen_rot (MT_CKD252.cc:1762-1971)
void n2_rot(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double n2, double o2, double h2o) {
  constexpr double v1t = -10.0, v2t = 350.0, dvt = 5.0;
  constexpr int npt = 73;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = dvt;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - v1t) / dvt + 0.01);
  if (V1C < v1t) I1 = -1;
  V1C = v1t + dvt * (double)(I1 - 1);
  const int I2 = (int)((V2C - v1t) / dvt + 0.01);
  int NPTC = I2 - I1 + 3;
  if (NPTC > npt) NPTC = npt + 1;
  V2C = V1C + dvt * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> C0(NPTC + 1, 0.), C1(NPTC + 1, 0.),
      sf_T0(NPTC + 1, 0.), sf_T1(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J - 2;
    if ((I >= 0) && (I < npt)) {
      C0[J] = N2R_CT296[I];
      sf_T0[J] = N2R_SF296[I];
      C1[J] = N2R_CT220[I];
      sf_T1[J] = N2R_SF220[I];
    }
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double facfac =
      n2 * (Pave / PO) * (Pave / PO) * (T1 / Tave) * (T1 / Tave);
  const double XKT = Tave / 1.4387752;
  const double Tfac = (Tave - TO) / (220.0 - TO);
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double SN2 = 0.0;
    if ((C0[J] > 0.0) && (C1[J] > 0.0)) {
      const double C = C0[J] * std::pow(C1[J] / C0[J], Tfac);
      const double sf =
          (sf_T0[J] * std::pow(sf_T1[J] / sf_T0[J], Tfac) - 1.0) *
          (0.79 / 0.21);
      SN2 = facfac * C * (n2 + sf * o2 + h2o);
    }
    k[J] = SN2 * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > 0.0) && (V < v2t))
      alpha[s] = n2 * 1e2 * lerp_out(k, V1C, DVC, V);
  }
}
}  // namespace mt_ckd252

// ---------------------------------------------------------------------------
// MT_CKD 1.00 O2 band models (MT_CKD100.cc): CIA fundamental :184,
// v0<-v0 :381, v1<-v0 :580.  4-point XINT interpolation.
// ---------------------------------------------------------------------------
namespace mt_ckd100 {
constexpr double xLosmt = 2.686763e19, T1 = 273.0, TO = 296.0, PO = 1013.0;

// oxygen_cia (MT_CKD100.cc:184-380)
void o2_cia(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double vmr) {
  constexpr double v1t = 1340.0, v2t = 1850.0, dvt = 5.0;
  constexpr int npt = 103;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = dvt;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - v1t) / dvt);
  if (V1C < v1t) I1 = -1;
  V1C = v1t + dvt * (double)I1;
  const int I2 = (int)((V2C - v1t) / dvt);
  int NPTC = I2 - I1 + 3;
  if (NPTC > npt) NPTC = npt + 1;
  V2C = V1C + dvt * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> xo2(NPTC + 1, 0.), xo2t(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J;
    if ((I > 0) && (I <= npt)) {
      xo2[J] = O2F_100[I];
      xo2t[J] = O2FT_100[I];
    }
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double WTOT = xLosmt * (Pave / PO) * (T1 / Tave);
  const double tau_fac = WTOT * (Pave / PO) * (T1 / Tave);
  const double XKT = Tave / 1.4387752;
  const double xktfac = (1.0 / TO) - (1.0 / Tave);
  const double factor = 1.0 / xLosmt;
  std::vector<double> k(NPTC + 2, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double SO2 = 0.0;
    if (xo2[J] > 0.0) {
      const double C0 = factor * xo2[J] * std::exp(xo2t[J] * xktfac) / VJ;
      SO2 = tau_fac * C0;
    }
    k[J] = SO2 * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > v1t) && (V < v2t))
      alpha[s] = vmr * 1e2 * ckdmt350::XINT_FUN(V1C, DVC, k, V);
  }
}

// oxygen_v0v0 (MT_CKD100.cc:381-580)
void o2_v0v0(std::vector<double>& alpha, const std::vector<double>& f_hz,
             double t, double p_pa, double o2, double n2) {
  constexpr double v1t = 7536.0, v2t = 8500.0, dvt = 2.0;
  constexpr int npt = 483;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = dvt;
  double V1C = V1ABS - DVC, V2C = V2ABS + DVC;
  int I1 = (int)((V1C - v1t) / dvt);
  if (V1C < v1t) I1 = I1 - 1;
  V1C = v1t + dvt * (double)I1;
  const int I2 = (int)((V2C - v1t) / dvt);
  const int NPTC = I2 - I1 + 3;
  V2C = V1C + dvt * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> CO(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const int I = I1 + J;
    if ((I > 0) && (I <= npt)) {
      const double VJ = V1C + DVC * (double)(J - 1);
      CO[J] = O2_00_100[I] / VJ;
    }
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double ADJWO2 = (o2 + 0.3 * n2) / 0.446 * (Pave / PO) * (Pave / PO) *
                        (T1 / Tave) * (T1 / Tave);
  const double XKT = Tave / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double SO2 = 0.0;
    if (CO[J] > 0.0) SO2 = ADJWO2 * CO[J];
    k[J] = SO2 * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > v1t) && (V < v2t))
      alpha[s] = o2 * 1e2 * ckdmt350::XINT_FUN(V1C, DVC, k, V);
  }
}

// oxygen_v0v1 (MT_CKD100.cc:580-736); the window is f_grid-anchored
void o2_v1v0(std::vector<double>& alpha, const std::vector<double>& f_hz,
             double t, double p_pa, double vmr) {
  constexpr double V1S = 9100.0, V2S = 11000.0, DVS = 2.0;
  constexpr double V1_osc = 9375.0, HW1 = 58.96, S1 = 1.166e-4;
  constexpr double V2_osc = 9439.0, HW2 = 45.04, S2 = 3.086e-5;
  const int nf = (int)f_hz.size();
  const double V1ABS = f_hz[0] / (c_light * 1e2);
  const double V2ABS = f_hz[nf - 1] / (c_light * 1e2);
  const double DVC = DVS;
  double V1C = V1ABS - DVC;
  double V2C = V2ABS + DVC;
  const int NPTC = (int)((V2C - V1C) / DVC + 3);
  V2C = V1C + DVC * (double)(NPTC - 1);
  if (NPTC < 1) return;
  std::vector<double> C(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    if ((VJ > V1S) && (VJ < V2S)) {
      const double DV1 = VJ - V1_osc;
      const double DV2 = VJ - V2_osc;
      const double DAMP1 = DV1 < 0.0 ? std::exp(DV1 / 176.1) : 1.0;
      const double DAMP2 = DV2 < 0.0 ? std::exp(DV2 / 176.1) : 1.0;
      const double O2INF =
          0.31831 *
          ((S1 * DAMP1 / HW1) / (1.0 + (DV1 / HW1) * (DV1 / HW1)) +
           (S2 * DAMP2 / HW2) / (1.0 + (DV2 / HW2) * (DV2 / HW2))) *
          1.054;
      C[J] = O2INF / VJ;
    }
  }
  const double Tave = t, Pave = p_pa * 1e-2;
  const double WTOT = 1e-20 * xLosmt * (Pave / PO) * (T1 / Tave);
  const double ADJWO2 = (vmr / 0.209) * WTOT * (Pave / PO) * (TO / Tave);
  const double XKT = Tave / 1.4387752;
  std::vector<double> k(NPTC + 1, 0.);
  for (int J = 1; J <= NPTC; ++J) {
    const double VJ = V1C + DVC * (double)(J - 1);
    double SO2 = 0.0;
    if (C[J] > 0.0) SO2 = ADJWO2 * C[J];
    k[J] = SO2 * ckdmt350::RADFN_FUN(VJ, XKT);
  }
  for (int s = 0; s < nf; ++s) {
    const double V = f_hz[s] / (c_light * 1e2);
    if ((V > V1S) && (V < V2S))
      alpha[s] = vmr * 1e2 * ckdmt350::XINT_FUN(V1C, DVC, k, V);
  }
}
}  // namespace mt_ckd100

// ---------------------------------------------------------------------------
// PWR20xx (PWR20xx.cc:21-166 water, :494-573 oxygen, :792-833 nitrogen)
// ---------------------------------------------------------------------------
namespace pwr20xx {
using Complex = std::complex<double>;
constexpr double kB = 1.380649e-23;

struct H2OLine {
  double f0, s296, B, w0a, xwa, w0s, xws, da, xda, ds, xds, aa, as_,
      w2a, x2a, w2s, x2s, d2a, d2s;
};
// h2o_sdlist.asc tables (PWR20xx.cc:177-340 / :391-450)
static const H2OLine h2o_2021[16] = {
    {22.23508, 1.335e-14, 2.172, 2.74, 0.76, 13.63, 1.2, -0.033, 2.6, 0.814, 0., 0., 0., 0.435, 0., 1.91, 0., 0., 0.},
    {183.310087, 2.319e-12, 0.677, 3.033, 0.62, 15.01, 0.82, -0.074, 1.8, 0.136, 0.98, 0., 12.6, 0.407, 0.412, 1.46, 0.571, -0.016, 0.16},
    {321.22563, 7.657e-14, 6.262, 2.426, 0.73, 10.65, 0.54, -0.143, 0., 0.278, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {325.152888, 2.721e-12, 1.561, 2.847, 0.64, 13.95, 0.74, -0.013, 0., 1.325, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {380.197353, 2.477e-11, 1.062, 2.868, 0.54, 14.4, 0.89, -0.074, 0., 0.24, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {439.150807, 2.137e-12, 3.643, 2.055, 0.69, 9.06, 0.52, 0.051, 0., 0.165, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {443.018343, 4.440e-13, 5.116, 1.819, 0.7, 7.96, 0.5, 0.140, 0., -0.229, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {448.001085, 2.588e-11, 1.424, 2.612, 0.7, 13.01, 0.67, -0.116, 0., -0.615, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {470.888999, 8.196e-13, 3.645, 2.169, 0.73, 9.7, 0.65, 0.061, 0., -0.465, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {474.689092, 3.268e-12, 2.411, 2.366, 0.71, 11.24, 0.64, -0.027, 0., -0.72, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {488.490108, 6.628e-13, 2.89, 2.616, 0.75, 13.58, 0.72, -0.065, 0., -0.36, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {556.935985, 1.570e-09, 0.161, 3.115, 0.75, 14.24, 1., 0.187, 0., -1.693, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {620.700807, 1.700e-11, 2.423, 2.468, 0.79, 11.94, 0.75, 0.0, 0., 0.687, 0.92, 0., 0., 0., 0., 0., 0., 0., 0.},
    {658.006072, 9.033e-13, 7.921, 3.154, 0.73, 13.84, 1., 0.176, 0., -1.496, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {752.033113, 1.035e-09, 0.402, 3.114, 0.77, 13.58, 0.84, 0.162, 0., -0.878, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {916.171582, 4.275e-11, 1.461, 2.695, 0.79, 13.55, 0.48, 0.0, 0., 0.521, 0.47, 0., 0., 0., 0., 0., 0., 0., 0.}};
static const H2OLine h2o_2022[20] = {
    {22.23508, 1.334e-14, 2.172, 2.74, 0.76, 13.63, 1.2, -0.033, 2.6, 0.814, 0., 0., 0., 0.435, 0., 1.91, 0., 0., 0.},
    {183.310087, 2.319e-12, 0.677, 3.033, 0.62, 15.01, 0.82, -0.074, 1.8, 0.136, 0.98, 0., 12.6, 0.407, 0.412, 1.46, 0.571, -0.016, 0.16},
    {321.22563, 7.654e-14, 6.262, 2.426, 0.73, 10.65, 0.54, -0.143, 0., 0.278, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {325.152888, 2.720e-12, 1.561, 2.847, 0.64, 13.95, 0.74, -0.013, 0., 1.325, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {380.197353, 2.476e-11, 1.062, 2.868, 0.54, 14.4, 0.89, -0.074, 0., 0.24, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {439.150807, 2.136e-12, 3.643, 2.055, 0.69, 9.06, 0.52, 0.051, 0., 0.165, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {443.018343, 4.440e-13, 5.116, 1.819, 0.7, 7.96, 0.5, 0.140, 0., -0.229, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {448.001085, 2.587e-11, 1.424, 2.612, 0.7, 13.01, 0.67, -0.116, 0., -0.615, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {470.888999, 8.193e-13, 3.645, 2.169, 0.73, 9.7, 0.65, 0.061, 0., -0.465, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {474.689092, 3.268e-12, 2.411, 2.366, 0.71, 11.24, 0.64, -0.027, 0., -0.72, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {488.490108, 6.628e-13, 2.89, 2.616, 0.75, 13.58, 0.72, -0.065, 0., -0.36, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {556.935985, 1.570e-09, 0.161, 3.115, 0.75, 14.24, 1., 0.187, 0., -1.693, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {620.700807, 1.700e-11, 2.423, 2.468, 0.79, 11.94, 0.75, 0.001, 0., 0.687, 0.92, 0., 0., 0., 0., 0., 0., 0., 0.},
    {658.006072, 9.027e-13, 7.921, 3.154, 0.73, 13.84, 1., 0.176, 0., -1.496, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {752.033113, 1.035e-09, 0.402, 3.114, 0.77, 13.58, 0.84, 0.162, 0., -0.878, 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {859.965608, 5.705e-13, 8.163, 3.121, 0.76, 14.08, 0.76, 0.005, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {916.171582, 4.272e-11, 1.461, 2.695, 0.79, 13.55, 0.48, -0.001, 0., 0.521, 0.47, 0., 0., 0., 0., 0., 0., 0., 0.},
    {970.315045, 4.806e-11, 1.944, 2.574, 0.70, 25.95, 0.7, -0.003, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {987.926803, 7.528e-10, 0.261, 2.976, 0.75, 14.35, 0.75, -0.002, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.},
    {1097.36487, 4.890e-9, 0.754, 3.095, 0.75, 15.27, 0.75, 0.002, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.}};

// compute_h2o (PWR20xx.cc:21-166)
template <int N>
void water(std::vector<double>& alpha, const std::vector<double>& f_hz,
           double t, double p_pa, double vmr, const H2OLine (&tab)[N],
           double tref_cont, double c_f, double xc_f, double c_s,
           double xc_s) {
  if (vmr <= 0) return;
  const double p_hpa = 1e-2 * p_pa;
  const double pvap_hpa = vmr * p_hpa;
  const double pdry_hpa = p_hpa - pvap_hpa;
  const double pvap_bar = 1e-3 * pvap_hpa;
  const double pdry_bar = 1e-3 * pdry_hpa;
  const double theta_cont = tref_cont / t;
  const double th = 296.0 / t;
  const double logth = std::log(th);
  constexpr double line_cutoff = 750.0;
  double w0[N], w2[N], d2[N], shift[N], strength[N], base[N];
  for (int i = 0; i < N; i++) {
    const H2OLine& l = tab[i];
    // replacement of unknown temperature exponents (:63-76)
    const double xda = l.xda > 0 ? l.xda : l.xwa;
    const double xds = l.xds > 0 ? l.xds : l.xws;
    const double x2a = l.x2a > 0 ? l.x2a : l.xwa;
    const double x2s = l.x2s > 0 ? l.x2s : l.xws;
    w0[i] = l.w0a * pdry_bar * std::pow(th, l.xwa) +
            l.w0s * pvap_bar * std::pow(th, l.xws);
    w2[i] = l.w2a * pdry_bar * std::pow(th, x2a) +
            l.w2s * pvap_bar * std::pow(th, x2s);
    d2[i] = l.d2a * pdry_bar + l.d2s * pvap_bar;
    shift[i] = l.da * pdry_bar * (1.0 - l.aa * logth) * std::pow(th, xda) +
               l.ds * pvap_bar * (1.0 - l.as_ * logth) * std::pow(th, xds);
    strength[i] = l.s296 * std::pow(th, 2.5) * std::exp(l.B * (1.0 - th));
    base[i] = w0[i] / (line_cutoff * line_cutoff + w0[i] * w0[i]);
  }
  for (size_t iv = 0; iv < f_hz.size(); ++iv) {
    const double f = f_hz[iv] * 1e-9;
    const double cont =
        (c_f * pdry_hpa * std::pow(theta_cont, xc_f) +
         c_s * pvap_hpa * std::pow(theta_cont, xc_s)) *
        pvap_hpa * f * f * 1e-3;
    double line_sum = 0.0;
    for (int i = 0; i < N; i++) {
      const double df1 = f - tab[i].f0 - shift[i];
      const double df2 = f + tab[i].f0 + shift[i];
      double resonant = 0.0;
      if ((w2[i] > 0) && (std::abs(df1) < (10.0 * w0[i]))) {
        const Complex denom(w2[i], -d2[i]);
        const Complex xc =
            Complex(w0[i] - 1.5 * w2[i], df1 + 1.5 * d2[i]) / denom;
        const Complex xrt = std::sqrt(xc);
        constexpr double magic_number = 1.77245385090551603;
        const Complex pxw = magic_number * xrt * Faddeeva::erfcx(xrt);
        const Complex sd = 2.0 * (1.0 - pxw) / denom;
        resonant += sd.real() - base[i];
      } else if (std::abs(df1) < line_cutoff) {
        resonant += w0[i] / (df1 * df1 + w0[i] * w0[i]) - base[i];
      }
      if (std::abs(df2) < line_cutoff) {
        resonant += w0[i] / (df2 * df2 + w0[i] * w0[i]) - base[i];
      }
      line_sum += strength[i] * resonant * (f / tab[i].f0) * (f / tab[i].f0);
    }
    line_sum = 1e-13 * M_1_PI * line_sum * p_pa * vmr / (kB * t);
    alpha[iv] = line_sum + cont;
  }
}

// o2abs_19.f tables (PWR20xx.cc:586-664 / :694-772)
constexpr int NO2 = 49;
static const double o2_f0[NO2] = {
    118.7503, 56.2648, 62.4863, 58.4466, 60.3061, 59.5910, 59.1642,
    60.4348, 58.3239, 61.1506, 57.6125, 61.8002, 56.9682, 62.4112,
    56.3634, 62.9980, 55.7838, 63.5685, 55.2214, 64.1278, 54.6712,
    64.6789, 54.1300, 65.2241, 53.5958, 65.7648, 53.0669, 66.3021,
    52.5424, 66.8368, 52.0214, 67.3696, 51.5034, 67.9009, 50.9877,
    68.4310, 50.4742, 68.9603, 233.9461, 368.4982, 401.7398, 424.7630,
    487.2493, 566.8956, 715.3929, 731.1866, 773.8395, 834.1455, 895.0710};
static const double o2_s300_2021[NO2] = {
    0.2906e-14, 0.7957e-15, 0.2444e-14, 0.2194e-14, 0.3301e-14, 0.3243e-14,
    0.3664e-14, 0.3834e-14, 0.3588e-14, 0.3947e-14, 0.3179e-14, 0.3661e-14,
    0.2590e-14, 0.3111e-14, 0.1954e-14, 0.2443e-14, 0.1373e-14, 0.1784e-14,
    0.9013e-15, 0.1217e-14, 0.5545e-15, 0.7766e-15, 0.3201e-15, 0.4651e-15,
    0.1738e-15, 0.2619e-15, 0.8880e-16, 0.1387e-15, 0.4272e-16, 0.6923e-16,
    0.1939e-16, 0.3255e-16, 0.8301e-17, 0.1445e-16, 0.3356e-17, 0.6049e-17,
    0.1280e-17, 0.2394e-17, 0.3287e-16, 0.6463e-15, 0.1334e-16, 0.7049e-14,
    0.3011e-14, 0.1797e-16, 0.1826e-14, 0.2193e-16, 0.1153e-13, 0.3974e-14,
    0.2512e-16};
static const double o2_s300_2022[NO2] = {
    0.2906e-14, 0.7957e-15, 0.2444e-14, 0.2194e-14, 0.3301e-14, 0.3243e-14,
    0.3664e-14, 0.3834e-14, 0.3588e-14, 0.3947e-14, 0.3179e-14, 0.3661e-14,
    0.2590e-14, 0.3111e-14, 0.1954e-14, 0.2443e-14, 0.1373e-14, 0.1784e-14,
    0.9013e-15, 0.1217e-14, 0.5545e-15, 0.7766e-15, 0.3201e-15, 0.4651e-15,
    0.1738e-15, 0.2619e-15, 0.8880e-16, 0.1387e-15, 0.4272e-16, 0.6923e-16,
    0.1939e-16, 0.3255e-16, 0.8301e-17, 0.1445e-16, 0.3356e-17, 0.6049e-17,
    0.1280e-17, 0.2394e-17, 0.8299e-17, 0.6492e-15, 0.1354e-16, 0.7082e-14,
    0.3026e-14, 0.1823e-16, 0.1835e-14, 0.2226e-16, 0.1158e-13, 0.3992e-14,
    0.2550e-16};
static const double o2_be_2021[NO2] = {
    0.010, 0.014, 0.083, 0.083, 0.207, 0.207, 0.387, 0.387, 0.621, 0.621,
    0.910, 0.910, 1.255, 1.255, 1.654, 1.654, 2.109, 2.109, 2.618, 2.618,
    3.182, 3.182, 3.800, 3.800, 4.474, 4.474, 5.201, 5.201, 5.983, 5.983,
    6.819, 6.819, 7.709, 7.709, 8.653, 8.653, 9.651, 9.651, 0.019, 0.048,
    0.045, 0.044, 0.049, 0.084, 0.145, 0.136, 0.141, 0.145, 0.201};
static const double o2_be_2022[NO2] = {
    0.010, 0.014, 0.083, 0.083, 0.207, 0.207, 0.387, 0.387, 0.621, 0.621,
    0.910, 0.910, 1.255, 1.255, 1.654, 1.654, 2.109, 2.109, 2.618, 2.618,
    3.182, 3.182, 3.800, 3.800, 4.474, 4.474, 5.201, 5.201, 5.983, 5.983,
    6.819, 6.819, 7.709, 7.709, 8.653, 8.653, 9.651, 9.651, 0.019, 0.048,
    0.045, 0.044, 0.049, 0.084, 0.145, 0.136, 0.140, 0.145, 0.201};
static const double o2_w300[NO2] = {
    1.685, 1.703, 1.513, 1.495, 1.433, 1.408, 1.353, 1.353, 1.303, 1.319,
    1.262, 1.265, 1.238, 1.217, 1.207, 1.207, 1.137, 1.137, 1.101, 1.101,
    1.037, 1.038, 0.996, 0.996, 0.955, 0.955, 0.906, 0.906, 0.858, 0.858,
    0.811, 0.811, 0.764, 0.764, 0.717, 0.717, 0.669, 0.669, 1.65, 1.64,
    1.64, 1.64, 1.60, 1.60, 1.60, 1.60, 1.62, 1.47, 1.47};
static const double o2_y0[NO2] = {
    -0.041, 0.277, -0.373, 0.560, -0.573, 0.618, -0.366, 0.278, -0.089,
    -0.021, 0.0599, -0.152, 0.216, -0.293, 0.374, -0.436, 0.491, -0.542,
    0.571, -0.613, 0.636, -0.670, 0.690, -0.718, 0.740, -0.763, 0.788,
    -0.807, 0.834, -0.849, 0.876, -0.887, 0.915, -0.922, 0.950, -0.955,
    0.987, -0.988, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.};
static const double o2_y1[NO2] = {
    0.000, 0.11, -0.009, 0.007, 0.049, -0.1, 0.260, -0.346, 0.364,
    -0.422, 0.315, -0.341, 0.483, -0.503, 0.598, -0.610, 0.630, -0.633,
    0.613, -0.611, 0.570, -0.564, 0.58, -0.57, 0.61, -0.60, 0.64,
    -0.62, 0.65, -0.64, 0.66, -0.64, 0.66, -0.64, 0.66, -0.64,
    0.65, -0.63, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.};
static const double o2_g0[NO2] = {
    -0.000695, -0.090, -0.103, -0.239, -0.172, -0.171, 0.028, 0.150, 0.132,
    0.170, 0.087, 0.069, 0.083, 0.068, 0.007, 0.016, -0.021, -0.066,
    -0.095, -0.116, -0.118, -0.140, -0.173, -0.186, -0.217, -0.227, -0.234,
    -0.242, -0.266, -0.272, -0.301, -0.304, -0.334, -0.333, -0.362, -0.358,
    -0.348, -0.344, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.};
static const double o2_g1[NO2] = {
    0.000, -0.042, 0.004, 0.025, 0.083, 0.167, 0.178, 0.223, 0.054,
    0.003, 0.002, -0.044, -0.019, -0.054, -0.177, -0.208, -0.294, -0.334,
    -0.368, -0.386, -0.374, -0.384, -0.387, -0.389, -0.423, -0.422, -0.46,
    -0.46, -0.51, -0.50, -0.55, -0.53, -0.58, -0.56, -0.62, -0.59,
    -0.68, -0.65, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.};
static const double o2_dnu0[NO2] = {
    -0.00028, 0.00596, -0.01950, 0.032, -0.0475, 0.0541, -0.0232,
    0.0155, 0.0007, -0.0086, -0.0026, -0.0013, -0.0004, -0.002,
    0.005, -0.007, 0.007, -0.008, 0.006, -0.007, 0.006,
    -0.006, 0.005, -0.0049, 0.0040, -0.0041, 0.0036, -0.0037,
    0.0033, -0.0034, 0.0032, -0.0032, 0.0030, -0.0030, 0.0028,
    -0.0029, 0.0029, -0.0029, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.};
static const double o2_dnu1[NO2] = {
    -0.00037, 0.0086, -0.013, 0.019, -0.026, 0.027, 0.005,
    -0.014, 0.012, -0.018, -0.015, 0.015, 0.003, -0.004,
    0.012, -0.013, 0.012, -0.012, 0.009, -0.009, 0.002,
    -0.002, 0.0005, -0.0005, 0.002, -0.002, 0.002, -0.002,
    0.002, -0.002, 0.002, -0.002, 0.002, -0.002, 0.001,
    -0.001, 0.0004, -0.0004, 0., 0., 0., 0., 0., 0., 0., 0., 0., 0., 0.};

// compute_o2 (PWR20xx.cc:494-573)
void oxygen(std::vector<double>& alpha, const std::vector<double>& f_hz,
            double t, double p_pa, double o2_vmr, double h2o_vmr,
            const double (&s300)[NO2], const double (&be)[NO2]) {
  constexpr double cont_width_300 = 0.56;
  constexpr double x = 0.754;
  const double theta = 300.0 / t;
  const double dth = theta - 1.0;
  const double b = std::pow(theta, x);
  const double pvap_pa = h2o_vmr * p_pa;
  const double pdry_pa = p_pa - pvap_pa;
  const double pvap_bar = 1e-5 * pvap_pa;
  const double pdry_bar = 1e-5 * pdry_pa;
  const double den = pdry_bar * b + 1.2 * pvap_bar * theta;
  const double df_cont = cont_width_300 * den;
  const double pe2 = den * den;
  double y[NO2], dnu[NO2], g[NO2], width[NO2], strength[NO2];
  for (int i = 0; i < NO2; i++) {
    y[i] = den * (o2_y0[i] + o2_y1[i] * dth);
    dnu[i] = pe2 * (o2_dnu0[i] + o2_dnu1[i] * dth);
    g[i] = 1.0 + pe2 * (o2_g0[i] + o2_g1[i] * dth);
    width[i] = o2_w300[i] * den;
    strength[i] = s300[i] * std::exp(-be[i] * dth);
  }
  for (size_t iv = 0; iv < f_hz.size(); ++iv) {
    const double f = f_hz[iv] * 1e-9;
    const double f2 = f * f;
    const double cont =
        1.584e-17 * f2 * df_cont / (theta * (f2 + df_cont * df_cont));
    double sum = cont;
    for (int i = 0; i < NO2; i++) {
      const double df1 = f - o2_f0[i] - dnu[i];
      const double df2 = f + o2_f0[i] + dnu[i];
      const double den1 = df1 * df1 + width[i] * width[i];
      const double den2 = df2 * df2 + width[i] * width[i];
      const double sfac1 = (width[i] * g[i] + df1 * y[i]) / den1;
      const double sfac2 = (width[i] * g[i] - df2 * y[i]) / den2;
      sum += strength[i] * (sfac1 + sfac2) * (f / o2_f0[i]) * (f / o2_f0[i]);
    }
    const double absorption = 1.004 * 1e-13 * o2_vmr * M_1_PI /
                              (kB * 300.0) * sum * pdry_pa *
                              theta * theta * theta;
    alpha[iv] = absorption > 0 ? absorption : 0.0;
  }
}

// compute_n2 (PWR20xx.cc:792-833)
void nitrogen(std::vector<double>& alpha, const std::vector<double>& f_hz,
              double t, double p_pa, double n2_vmr, double h2o_vmr) {
  const double theta = 300.0 / t;
  const double pdry_hpa = 1e-2 * p_pa * (1.0 - h2o_vmr);
  const double cont = (n2_vmr / 0.781) * 9.95e-14 * pdry_hpa * pdry_hpa *
                      std::pow(theta, 3.22);
  for (size_t iv = 0; iv < f_hz.size(); ++iv) {
    const double f = f_hz[iv] * 1e-9;
    const double fdep = 0.5 + 0.5 / (1.0 + (f / 450.0) * (f / 450.0));
    alpha[iv] = cont * fdep * f * f / 1000.0;
  }
}
}  // namespace pwr20xx

// ---------------------------------------------------------------------------
static void emit(const char* name, const std::vector<double>& f,
                 double t, double p, double vmr,
                 const std::vector<double>& alpha, bool& first,
                 double vmr_h2o = -1.0, double vmr_o2 = -1.0,
                 double vmr_n2 = -1.0) {
  if (!first) printf(",\n");
  first = false;
  printf("  {\"model\": \"%s\", \"t\": %.17g, \"p\": %.17g, \"vmr\": %.17g,\n",
         name, t, p, vmr);
  if (vmr_h2o >= 0.0) printf("   \"vmr_h2o\": %.17g,\n", vmr_h2o);
  if (vmr_o2 >= 0.0) printf("   \"vmr_o2\": %.17g,\n", vmr_o2);
  if (vmr_n2 >= 0.0) printf("   \"vmr_n2\": %.17g,\n", vmr_n2);
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

  // MPM89 H2O: lines + continuum region, wet/dry/cold states
  {
    std::vector<double> f;
    for (int i = 0; i < 40; i++) f.push_back(5e9 + i * 25e9);
    for (auto [t, p, x] : {std::array<double, 3>{296.0, 101325.0, 0.02},
                           std::array<double, 3>{250.0, 3.0e4, 1e-4},
                           std::array<double, 3>{310.0, 9.5e4, 0.04}}) {
      std::vector<double> a(f.size(), 0.0);
      mpm89::water(a, f, t, p, x);
      emit("H2O-MPM89", f, t, p, x, a, first);
    }
  }

  // MPM89 + TRE05 O2: 60 GHz band + wings + sub-mm lines, with/without H2O
  {
    std::vector<double> f;
    for (int i = 0; i < 50; i++) f.push_back(45e9 + i * 0.55e9);
    f.push_back(118.75e9);
    f.push_back(424.7e9);
    for (auto [t, p, x, w] :
         {std::array<double, 4>{296.0, 101325.0, 0.2095, 0.01},
          std::array<double, 4>{230.0, 1.0e4, 0.2095, 0.0},
          std::array<double, 4>{310.0, 8.0e4, 0.18, 0.03}}) {
      std::vector<double> a1v(f.size(), 0.0), a2v(f.size(), 0.0);
      mpm89::oxygen(a1v, f, t, p, x, w);
      tre05::oxygen(a2v, f, t, p, x, w);
      emit("O2-MPM89", f, t, p, x, a1v, first, w);
      emit("O2-TRE05", f, t, p, x, a2v, first, w);
    }
  }

  // MPM93 N2 continuum: broadband, wet/dry
  {
    std::vector<double> f;
    for (int i = 0; i < 30; i++) f.push_back(1e9 + i * 33e9);
    for (auto [t, p, x, w] :
         {std::array<double, 4>{296.0, 101325.0, 0.781, 0.02},
          std::array<double, 4>{220.0, 2.0e4, 0.781, 0.0}}) {
      std::vector<double> a(f.size(), 0.0);
      mpm93::nitrogen(a, f, t, p, x, w);
      emit("N2-SelfContMPM93", f, t, p, x, a, first, w);
    }
  }

  // CKDMT320 self/foreign: same states as the 350 configs
  {
    std::vector<double> f;
    for (int i = 0; i < 40; i++) f.push_back(10e9 + i * 14.9e12);
    for (auto [t, p, x] : {std::array<double, 3>{296.0, 101325.0, 0.02},
                           std::array<double, 3>{260.0, 5e4, 1e-3},
                           std::array<double, 3>{310.0, 9.5e4, 0.04}}) {
      std::vector<double> a1v(f.size(), 0.0), a2v(f.size(), 0.0);
      ckdmt320::self_h2o(a1v, f, t, p, x);
      ckdmt320::foreign_h2o(a2v, f, t, p, x);
      emit("H2O-SelfContCKDMT320", f, t, p, x, a1v, first);
      emit("H2O-ForeignContCKDMT320", f, t, p, x, a2v, first);
    }
  }

  // MT_CKD 2.52 / 1.00 band models; off-lattice wavenumbers
  {
    const double kaycm = 2.99792458e10;  // cm^-1 -> Hz
    auto grid = [&](double v_lo, double v_hi, int n) {
      std::vector<double> f;
      for (int i = 0; i < n; i++)
        f.push_back((v_lo + (v_hi - v_lo) * i / (n - 1) + 0.137) * kaycm);
      return f;
    };
    for (auto [t, p] : {std::array<double, 2>{296.0, 101325.0},
                        std::array<double, 2>{250.0, 5.0e4}}) {
      {  // CO2 continuum incl. bandhead + Xfac regions
        auto f = grid(300.0, 2995.0, 40);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd252::co2(a, f, t, p, 4.2e-4);
        emit("CO2-CKDMT252", f, t, p, 4.2e-4, a, first);
      }
      {  // O2 visible
        auto f = grid(15100.0, 29000.0, 30);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd252::o2_vis(a, f, t, p, 0.2095);
        emit("O2-visCKDMT252", f, t, p, 0.2095, a, first);
      }
      {  // N2 CIA fundamental (mixture-broadened)
        auto f = grid(2010.0, 2700.0, 30);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd252::n2_fun(a, f, t, p, 0.781, 0.2095, 0.01);
        emit("N2-CIAfunCKDMT252", f, t, p, 0.781, a, first, 0.01, 0.2095);
      }
      {  // N2 CIA rotational
        auto f = grid(5.0, 345.0, 30);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd252::n2_rot(a, f, t, p, 0.781, 0.2095, 0.01);
        emit("N2-CIArotCKDMT252", f, t, p, 0.781, a, first, 0.01, 0.2095);
      }
      {  // O2 CIA fundamental
        auto f = grid(1345.0, 1845.0, 30);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd100::o2_cia(a, f, t, p, 0.2095);
        emit("O2-CIAfunCKDMT100", f, t, p, 0.2095, a, first);
      }
      {  // O2 v0<-v0 1.27um band (N2-adjusted)
        auto f = grid(7540.0, 8495.0, 30);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd100::o2_v0v0(a, f, t, p, 0.2095, 0.781);
        emit("O2-v0v0CKDMT100", f, t, p, 0.2095, a, first, -1.0, -1.0,
             0.781);
      }
      {  // O2 v1<-v0 band (analytic; f_grid-anchored window here)
        auto f = grid(9105.0, 10995.0, 30);
        std::vector<double> a(f.size(), 0.0);
        mt_ckd100::o2_v1v0(a, f, t, p, 0.2095);
        emit("O2-v1v0CKDMT100", f, t, p, 0.2095, a, first);
      }
    }
  }

  // PWR2021/PWR2022 H2O: SD-Voigt 22/183 GHz lines + wings + continuum
  {
    std::vector<double> f;
    for (int i = 0; i < 30; i++) f.push_back(15e9 + i * 12e9);
    f.push_back(22.23e9);  // on the SD line
    f.push_back(183.31e9);
    for (auto [t, p, x] : {std::array<double, 3>{296.0, 101325.0, 0.02},
                           std::array<double, 3>{250.0, 3.0e4, 1e-4},
                           std::array<double, 3>{310.0, 9.5e4, 0.04}}) {
      std::vector<double> a1v(f.size(), 0.0), a2v(f.size(), 0.0);
      pwr20xx::water(a1v, f, t, p, x, pwr20xx::h2o_2021, 300.0, 5.919e-10,
                     3.0, 1.416e-8, 7.5);
      pwr20xx::water(a2v, f, t, p, x, pwr20xx::h2o_2022, 300.0, 5.9197e-10,
                     3.0, 1.4162e-8, 7.5);
      emit("H2O-PWR2021", f, t, p, x, a1v, first);
      emit("H2O-PWR2022", f, t, p, x, a2v, first);
    }
  }

  // PWR2021/PWR2022 O2 + PWR2021 N2
  {
    std::vector<double> f;
    for (int i = 0; i < 50; i++) f.push_back(45e9 + i * 0.55e9);
    f.push_back(118.75e9);
    f.push_back(424.7e9);
    for (auto [t, p, x, w] :
         {std::array<double, 4>{296.0, 101325.0, 0.2095, 0.01},
          std::array<double, 4>{230.0, 1.0e4, 0.2095, 0.0},
          std::array<double, 4>{310.0, 8.0e4, 0.18, 0.03}}) {
      std::vector<double> a1v(f.size(), 0.0), a2v(f.size(), 0.0),
          a3v(f.size(), 0.0);
      pwr20xx::oxygen(a1v, f, t, p, x, w, pwr20xx::o2_s300_2021,
                      pwr20xx::o2_be_2021);
      pwr20xx::oxygen(a2v, f, t, p, x, w, pwr20xx::o2_s300_2022,
                      pwr20xx::o2_be_2022);
      pwr20xx::nitrogen(a3v, f, t, p, 0.781, w);
      emit("O2-PWR2021", f, t, p, x, a1v, first, w);
      emit("O2-PWR2022", f, t, p, x, a2v, first, w);
      emit("N2-SelfContPWR2021", f, t, p, 0.781, a3v, first, w);
    }
  }

  printf("\n]}\n");
  return 0;
}
