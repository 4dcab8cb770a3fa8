"""Compile the reference's dependency-free DSP/FEC sources for parity tests.

VERDICT round-1 item 1 asked for cross-validation against the actual
reference decoder.  The full build is impossible here (CMake stops at
the mandatory liquid-dsp dependency; fftw3f/libacars/libconfig are also
absent and the environment has no package installation or egress — see
doc/VALIDATION.md for the attempt log).  But a large subset of the
reference's DSP core has NO external dependencies:

  src/crc.c                     CRC-16-CCITT
  src/libcsdr.c                 FIR design (windowed sinc bandpass)
  src/libcsdr_gpl.c             decimating shift-addition mixer
  src/fastddc.c                 overlap-&-scrap DDC geometry + inverse path
  src/libfec/viterbi27_port.c   K=7 R=1/2 Viterbi (Phil Karn port)

This module compiles those files IN PLACE (nothing is copied into the
repo) into a throwaway shared library, with two stand-ins:

  - stub util.h/config.h providing only alloc/debug macros (the real
    util.h drags in libacars); gcc's `-I-` inhibits the
    directory-of-includer search so the stubs can shadow them;
  - a naive O(n^2) DFT implementing the csdr_make_fft_c2c API in place
    of FFTW (exact within float tolerance at the small sizes used in
    tests; FFTW_FORWARD == e^{-i 2 pi k n / N}, unnormalized).

Tests then drive the reference machinery through ctypes and compare
bit-for-bit / within-float-tolerance against dumphfdl_tpu.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

REF_SRC = pathlib.Path('/root/reference/src')
BUILD_DIR = pathlib.Path('/tmp/dumphfdl_refparity')

_STUB_UTIL_H = r'''
#pragma once
#include <stdlib.h>
#include <stdio.h>
#include <stdint.h>
/* minimal stand-ins for the reference's util.h (which needs libacars) */
void *xcalloc(size_t nmemb, size_t size, char const *file, int32_t line, char const *func);
void *xrealloc(void *ptr, size_t size, char const *file, int32_t line, char const *func);
#define XCALLOC(nmemb, size) xcalloc((nmemb), (size), __FILE__, __LINE__, __func__)
#define XREALLOC(ptr, size) xrealloc((ptr), (size), __FILE__, __LINE__, __func__)
#define XFREE(ptr) do { free(ptr); ptr = NULL; } while(0)
#define NEW(type, x) type *(x) = XCALLOC(1, sizeof(type))
#define UNUSED(x) (void)(x)
#define ASSERT(expr) do { if(!(expr)) { fprintf(stderr, "ASSERT failed: %s\n", #expr); abort(); } } while(0)
#define debug_print(debug_class, ...) do {} while(0)
#define debug_print_buf_hex(debug_class, buf, len, ...) do {} while(0)
#define D_DSP 0
#define D_DSP_DETAIL 0
'''

_STUB_CONFIG_H = '#pragma once\n'

_STUBS_C = r'''
#include <stdlib.h>
#include <stdint.h>
#include <complex.h>
#include <math.h>
#include "fft.h"

void *xcalloc(size_t nmemb, size_t size, char const *file, int32_t line, char const *func) {
    (void)file; (void)line; (void)func;
    return calloc(nmemb, size);
}
void *xrealloc(void *ptr, size_t size, char const *file, int32_t line, char const *func) {
    (void)file; (void)line; (void)func;
    return realloc(ptr, size);
}

/* naive DFT implementing the csdr FFT API (FFTW conventions:
 * forward = e^{-i 2 pi k n / N}, both directions unnormalized) */
FFT_PLAN_T *csdr_make_fft_c2c(int32_t size, float complex *input,
        float complex *output, int32_t forward, int32_t benchmark) {
    (void)benchmark;
    FFT_PLAN_T *p = calloc(1, sizeof(*p));
    p->size = size;
    p->input = input;
    p->output = output;
    p->plan = malloc(sizeof(int32_t));
    *(int32_t *)p->plan = forward;
    return p;
}

void csdr_fft_execute(FFT_PLAN_T *p) {
    int32_t forward = *(int32_t *)p->plan;
    int32_t n = p->size;
    float complex const *in = p->input;
    float complex *out = p->output;
    double sign = forward ? -1.0 : 1.0;
    for (int32_t k = 0; k < n; k++) {
        double re = 0.0, im = 0.0;
        for (int32_t t = 0; t < n; t++) {
            double ang = sign * 2.0 * M_PI * (double)k * (double)t / (double)n;
            double c = cos(ang), s = sin(ang);
            double xr = crealf(in[t]), xi = cimagf(in[t]);
            re += xr * c - xi * s;
            im += xr * s + xi * c;
        }
        out[k] = (float)re + I * (float)im;
    }
}

void csdr_fft_destroy(void) {}
void csdr_fft_init(int32_t n) { (void)n; }
void csdr_destroy_fft_c2c(FFT_PLAN_T *p) { if (p) { free(p->plan); free(p); } }
'''

_SOURCES = [
    'crc.c',
    'libcsdr.c',
    'libcsdr_gpl.c',
    'fastddc.c',
    'libfec/viterbi27_port.c',
]


WINDOW_HAMMING = 2   # libcsdr.h:39 enum order: BOXCAR, BLACKMAN, HAMMING


class ShiftAdditionData(ctypes.Structure):
    _fields_ = [('sindelta', ctypes.c_float),
                ('cosdelta', ctypes.c_float),
                ('rate', ctypes.c_float)]


class DecimatingShiftAdditionStatus(ctypes.Structure):
    _fields_ = [('decimation_remain', ctypes.c_int32),
                ('starting_phase', ctypes.c_float),
                ('output_size', ctypes.c_int32)]


class FastDDC(ctypes.Structure):
    _fields_ = [('pre_decimation', ctypes.c_int32),
                ('post_decimation', ctypes.c_int32),
                ('taps_length', ctypes.c_int32),
                ('taps_min_length', ctypes.c_int32),
                ('overlap_length', ctypes.c_int32),
                ('fft_size', ctypes.c_int32),
                ('fft_inv_size', ctypes.c_int32),
                ('input_size', ctypes.c_int32),
                ('post_input_size', ctypes.c_int32),
                ('pre_shift', ctypes.c_float),
                ('startbin', ctypes.c_int32),
                ('v', ctypes.c_int32),
                ('offsetbin', ctypes.c_int32),
                ('post_shift', ctypes.c_float),
                ('output_scrape', ctypes.c_int32),
                ('scrap', ctypes.c_int32),
                ('dsadata', ShiftAdditionData)]


class FFTPlan(ctypes.Structure):
    _fields_ = [('size', ctypes.c_int32),
                ('input', ctypes.c_void_p),
                ('output', ctypes.c_void_p),
                ('plan', ctypes.c_void_p)]


class FFTChannelizer(ctypes.Structure):
    _fields_ = [('ddc', ctypes.POINTER(FastDDC)),
                ('inv_plan', ctypes.POINTER(FFTPlan)),
                ('inv_input', ctypes.c_void_p),
                ('inv_output', ctypes.c_void_p),
                ('filtertaps_fft', ctypes.c_void_p),
                ('shift_status', DecimatingShiftAdditionStatus)]


def _check_sources() -> bool:
    return all((REF_SRC / s).exists() for s in _SOURCES)


def build() -> pathlib.Path | None:
    """Build (or reuse) the parity shared library; None if impossible."""
    if not _check_sources():
        return None
    lib = BUILD_DIR / 'librefparity.so'
    stamp = BUILD_DIR / 'build.ok'
    if lib.exists() and stamp.exists():
        return lib
    stub = BUILD_DIR / 'stub'
    stub.mkdir(parents=True, exist_ok=True)
    (stub / 'util.h').write_text(_STUB_UTIL_H)
    (stub / 'config.h').write_text(_STUB_CONFIG_H)
    stubs_c = BUILD_DIR / 'refstubs.c'
    stubs_c.write_text(_STUBS_C)
    cmd = ['gcc', '-O2', '-fPIC', '-shared', '-fcommon',
           '-I' + str(stub), '-I' + str(REF_SRC),
           '-I' + str(REF_SRC / 'libfec'), '-I-',
           str(stubs_c)] + [str(REF_SRC / s) for s in _SOURCES] + \
          ['-o', str(lib), '-lm']
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        (BUILD_DIR / 'build.err').write_text(proc.stderr)
        return None
    stamp.write_text('ok')
    return lib


def load() -> ctypes.CDLL | None:
    lib = build()
    if lib is None:
        return None
    dll = ctypes.CDLL(str(lib), mode=os.RTLD_LOCAL)
    # prototypes
    dll.crc16_ccitt.restype = ctypes.c_uint16
    dll.crc16_ccitt.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                ctypes.c_uint16]
    dll.firdes_bandpass_c.restype = None
    dll.firdes_bandpass_c.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_float, ctypes.c_float,
                                      ctypes.c_int32]
    dll.next_pow2.restype = ctypes.c_int32
    dll.next_pow2.argtypes = [ctypes.c_int32]
    dll.compute_fft_decimation_rate.restype = ctypes.c_int32
    dll.compute_fft_decimation_rate.argtypes = [ctypes.c_int32, ctypes.c_int32]
    dll.fastddc_init.restype = ctypes.c_int32
    dll.fastddc_init.argtypes = [ctypes.POINTER(FastDDC), ctypes.c_float,
                                 ctypes.c_int32, ctypes.c_float]
    dll.fft_channelizer_create.restype = ctypes.POINTER(FFTChannelizer)
    dll.fft_channelizer_create.argtypes = [ctypes.c_int32, ctypes.c_float,
                                           ctypes.c_float]
    dll.fastddc_inv_cc.restype = DecimatingShiftAdditionStatus
    dll.fastddc_inv_cc.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.POINTER(FastDDC),
                                   ctypes.POINTER(FFTPlan),
                                   ctypes.c_void_p,
                                   DecimatingShiftAdditionStatus]
    dll.fft_swap_sides.restype = None
    dll.fft_swap_sides.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    dll.create_viterbi27.restype = ctypes.c_void_p
    dll.create_viterbi27.argtypes = [ctypes.c_int]
    dll.init_viterbi27.restype = ctypes.c_int
    dll.init_viterbi27.argtypes = [ctypes.c_void_p, ctypes.c_int]
    dll.update_viterbi27_blk.restype = ctypes.c_int
    dll.update_viterbi27_blk.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_int]
    dll.chainback_viterbi27.restype = ctypes.c_int
    dll.chainback_viterbi27.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_uint, ctypes.c_uint]
    dll.delete_viterbi27.restype = None
    dll.delete_viterbi27.argtypes = [ctypes.c_void_p]
    return dll
