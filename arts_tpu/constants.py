"""Physical constants (SI, CODATA-2018) used across arts_tpu.

Parity reference: /root/reference/src/core/util/arts_constants.h — same
numerical values so spectra agree to machine precision with ARTS 3.
"""

import math

# Speed of light [m/s]
c = 299_792_458.0

# Planck constant [J s]
h = 6.626_070_15e-34

# Reduced Planck constant [J s]
h_bar = h / (2 * math.pi)

# Boltzmann constant [J/K]
k = 1.380_649e-23

# Avogadro constant [1/mol]
NA = 6.022_140_76e23

# Molar gas constant [J/(mol K)]
R = NA * k

# Elementary charge [C]
e = 1.602_176_634e-19

# Bohr magneton [J/T]
bohr_magneton = 9.274_010_0657e-24

# Unified atomic mass unit [kg]
m_u = 1e-3 / NA

# Stefan–Boltzmann constant [W/(m^2 K^4)]
sigma = (2 * math.pi**5 * k**4) / (15 * h**3 * c**2)

# pi and friends
pi = math.pi
inv_pi = 1.0 / math.pi
two_pi = 2.0 * math.pi
sqrt_pi = math.sqrt(math.pi)
inv_sqrt_pi = 1.0 / math.sqrt(math.pi)
sqrt_ln_2 = math.sqrt(math.log(2.0))
inv_sqrt_ln_2 = 1.0 / math.sqrt(math.log(2.0))
ln_2 = math.log(2.0)
ln_16 = math.log(16.0)

# Doppler broadening constant squared [m^2 K^-1 * (g/mol)]:
# gd = sqrt(doppler_broadening_const_squared * T / m) * f0 with m in g/mol
# (arts_constants.h:252: 2'000 * R / c^2)
doppler_broadening_const_squared = 2_000.0 * R / (c * c)

# Earth/standard values
earth_radius = 6_378_136.6  # equatorial, not used directly (geodesy has full ellipsoid)
standard_gravity = 9.80665  # [m/s^2]
standard_pressure = 101_325.0  # [Pa]

# CMB temperature [K] (arts_constants.h:283)
cosmic_microwave_background_temperature = 2.735

# Conversion helpers (pure python; host-side)
KAYSER = 100.0 * c  # 1 cm^-1 in Hz


def kaycm2freq(x):
    """Kayser (cm^-1) -> frequency [Hz]. Parity: pyarts3 convert.kaycm2freq."""
    return x * KAYSER


def freq2kaycm(x):
    return x / KAYSER


def wavelen2freq(x):
    """Wavelength [m] -> frequency [Hz]."""
    return c / x


def freq2wavelen(x):
    return c / x
