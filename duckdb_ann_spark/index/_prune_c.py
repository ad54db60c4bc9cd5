"""Compiled RobustPrune choose loops — bit-identical to the numpy
bodies in `vamana_core.VamanaGraph.robust_prune`.

Round 16 (optimization round 2; guide §1.2 "per-task work"): the named
r15 kernel floor was `robust_prune` at 58% of `build_graph`, and its
cost is numpy DISPATCH, not arithmetic — the large-pool choose loop
runs ~degree iterations of {eligibility scan, one gemv row, divide,
max-merge}, each a handful of numpy kernel launches over a few hundred
elements. This module compiles the exact same loop to C at first use
(plain `gcc -O2 -ffp-contract=off -shared`, no Python.h, called via
ctypes) and reproduces the numpy path BIT-FOR-BIT:

* the pair-distance gemv row is computed by THE SAME BLAS numpy uses —
  the bundled OpenBLAS's `cblas_sgemv(64_)` symbol is resolved at
  runtime and its address passed into the C kernel, so
  `cand[i+1:] @ cand[i]` is the identical routine with identical
  arguments (verified bit-equal across shapes in the parity test);
* every elementwise step is scalar IEEE f32/f64 arithmetic in the same
  association order as the numpy expressions, with numpy's NaN
  semantics reproduced explicitly (`np.maximum(v, 0)` keeps NaN;
  `np.maximum(occ, rrow)` propagates NaN; `x <= a` is False for NaN);
  `-ffp-contract=off` forbids FMA contraction so a*b+c rounds twice,
  exactly like the separate numpy kernels;
* the small-pool loop is pure comparisons over the precomputed ratio
  matrix — bit-identity is trivial there.

Decisions therefore match the numpy path exactly — byte-pinned golden
graphs build identically with the kernel on or off (pinned by
tests/test_vamana.py::test_prune_c_parity and the golden suites).
`SPARK_GRAFT_PRUNE_C=0` disables it; any compile/symbol failure falls
back silently to the numpy path (recorded in `_DISABLED_REASON`).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stddef.h>

typedef long long i64;

/* cblas_sgemv with 64-bit (ILP64, suffixed) or 32-bit (LP64) ints.
   The function POINTER comes from the caller, resolved out of the very
   OpenBLAS numpy links, so the dot rows are bit-identical to
   `cand[i+1:] @ cand[i]`. */
typedef void (*sgemv64_t)(i64 order, i64 trans, i64 m, i64 n, float alpha,
                          const float *a, i64 lda, const float *x, i64 incx,
                          float beta, float *y, i64 incy);
typedef void (*sgemv32_t)(int order, int trans, int m, int n, float alpha,
                          const float *a, int lda, const float *x, int incx,
                          float beta, float *y, int incy);

static void run_sgemv(void *fn, int width64, i64 rows, i64 dim,
                      const float *a, const float *x, float *y) {
    if (width64) {
        ((sgemv64_t)fn)(101, 111, rows, dim, 1.0f, a, dim, x, 1, 0.0f, y, 1);
    } else {
        ((sgemv32_t)fn)(101, 111, (int)rows, (int)dim, 1.0f, a, (int)dim,
                        x, 1, 0.0f, y, 1);
    }
}

/* Large-pool path: same decisions as the numpy while-loop.
   occ_buf (m doubles) and prow_buf (m floats) are caller scratch. */
i64 choose_large(const float *cand, const float *n2, const float *dists,
                 i64 m, i64 dim, i64 degree, double alpha, double inc,
                 int is_ip, void *sgemv, int width64,
                 i64 *chosen_out, float *prow_buf, double *occ_buf) {
    const float fmaxf32 = 3.4028234663852886e38f;
    const double fmax_d = (double)fmaxf32;
    i64 nchosen = 0;
    double cur_alpha = 1.0;
    for (i64 j = 0; j < m; j++) occ_buf[j] = 0.0;
    while (nchosen < degree) {
        i64 i = -1;
        for (i64 j = 0; j < m; j++) {
            /* NaN occ compares false, exactly like numpy */
            if (occ_buf[j] <= cur_alpha) { i = j; break; }
        }
        if (i >= 0) {
            occ_buf[i] = fmax_d;
            chosen_out[nchosen++] = i;
            i64 rem = m - i - 1;
            if (rem > 0) {
                run_sgemv(sgemv, width64, rem, dim,
                          cand + (size_t)(i + 1) * dim,
                          cand + (size_t)i * dim, prow_buf);
                if (is_ip) {
                    for (i64 j = 0; j < rem; j++) prow_buf[j] = -prow_buf[j];
                } else {
                    float n2i = n2[i];
                    for (i64 j = 0; j < rem; j++) {
                        /* (n2[i+1+j] + n2i) - 2.0f*dot : the numpy
                           association; NaN survives the clamp like
                           np.maximum(v, 0) */
                        float v = (n2[i + 1 + j] + n2i) - 2.0f * prow_buf[j];
                        prow_buf[j] = (v < 0.0f) ? 0.0f : v;
                    }
                }
                for (i64 j = 0; j < rem; j++) {
                    float r = dists[i + 1 + j] / prow_buf[j];
                    double rd = (prow_buf[j] == 0.0f) ? fmax_d : (double)r;
                    double cur = occ_buf[i + 1 + j];
                    /* np.maximum(occ, rrow): NaN in either propagates */
                    if (rd != rd) occ_buf[i + 1 + j] = rd;
                    else if (cur != cur) { /* stays NaN */ }
                    else if (rd > cur) occ_buf[i + 1 + j] = rd;
                }
            }
            continue;
        }
        if (cur_alpha == alpha) break;
        cur_alpha = cur_alpha * inc;
        if (cur_alpha > alpha) cur_alpha = alpha;
    }
    return nchosen;
}

/* Small-pool path: pure comparisons over the precomputed f32 ratio
   matrix (row-major m x m), python-float (f64) comparison semantics. */
i64 choose_small(const float *ratio, i64 m, i64 degree, double alpha,
                 double inc, i64 *chosen_out, double *occlude_buf) {
    const double fmax_d = 3.4028234663852886e38;
    i64 nchosen = 0;
    double cur_alpha = 1.0;
    for (i64 j = 0; j < m; j++) occlude_buf[j] = 0.0;
    while (nchosen < degree) {
        for (i64 i = 0; i < m; i++) {
            if (nchosen >= degree) break;
            if (occlude_buf[i] > cur_alpha) continue;
            occlude_buf[i] = fmax_d;
            chosen_out[nchosen++] = i;
            const float *ri = ratio + (size_t)i * m;
            for (i64 j = i + 1; j < m; j++) {
                double rij = (double)ri[j];
                if (rij > occlude_buf[j]) occlude_buf[j] = rij;
            }
        }
        if (cur_alpha == alpha) break;
        cur_alpha = cur_alpha * inc;
        if (cur_alpha > alpha) cur_alpha = alpha;
    }
    return nchosen;
}
"""

_lib = None
_sgemv_addr = None
_sgemv_width64 = None
_DISABLED_REASON: str | None = None


def _find_sgemv():
    """Resolve the cblas sgemv symbol from the OpenBLAS numpy itself
    links → (address, width64) or None."""
    import glob

    numpy_dir = os.path.dirname(np.__file__)
    cands = sorted(
        glob.glob(os.path.join(numpy_dir, "..", "numpy.libs", "*blas*"))
        + glob.glob(os.path.join(numpy_dir, ".libs", "*blas*"))
        + glob.glob(os.path.join(numpy_dir, "core", "*blas*"))
    )
    for path in cands:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        for sym, w64 in (("cblas_sgemv64_", True), ("cblas_sgemv", False)):
            fn = getattr(lib, sym, None)
            if fn is not None:
                return ctypes.cast(fn, ctypes.c_void_p).value, w64, lib
    return None


def _compile() -> str:
    """Compile the kernel to a cached .so keyed by source hash; atomic
    rename so concurrent Python workers race safely."""
    h = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "duckdb_ann_spark",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"prune_{h}.so")
    if os.path.exists(so_path):
        return so_path
    with tempfile.TemporaryDirectory(dir=cache_dir) as td:
        src = os.path.join(td, "prune.c")
        with open(src, "w") as f:
            f.write(_C_SRC)
        out = os.path.join(td, "prune.so")
        subprocess.run(
            ["gcc", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
             "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(out, so_path)  # atomic on the same filesystem
    return so_path


def _init():
    global _lib, _sgemv_addr, _sgemv_width64, _DISABLED_REASON
    if _lib is not None or _DISABLED_REASON is not None:
        return
    if os.environ.get("SPARK_GRAFT_PRUNE_C", "1") in ("0", "false", ""):
        _DISABLED_REASON = "disabled by SPARK_GRAFT_PRUNE_C"
        return
    try:
        got = _find_sgemv()
        if got is None:
            _DISABLED_REASON = "no cblas_sgemv symbol in numpy's BLAS"
            return
        _sgemv_addr, _sgemv_width64, _keepalive = got
        lib = ctypes.CDLL(_compile())
        lib.choose_large.restype = ctypes.c_longlong
        lib.choose_large.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.choose_small.restype = ctypes.c_longlong
        lib.choose_small.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib._keepalive = _keepalive  # hold the BLAS handle
        _lib = lib
    except Exception as e:  # pragma: no cover - environment-dependent
        _DISABLED_REASON = f"{type(e).__name__}: {e}"


def available() -> bool:
    _init()
    return _lib is not None


# per-call scratch, grown on demand; thread-local in case a driver
# builds graphs from several threads
import threading

_scratch = threading.local()


def _buffers(m: int):
    if getattr(_scratch, "m", 0) < m:
        _scratch.m = m
        _scratch.chosen = np.empty(m, dtype=np.int64)
        _scratch.prow = np.empty(m, dtype=np.float32)
        _scratch.occ = np.empty(m, dtype=np.float64)
    return _scratch.chosen, _scratch.prow, _scratch.occ


def choose_large(cand: np.ndarray, n2: np.ndarray, dists: np.ndarray,
                 degree: int, alpha: float, inc: float, is_ip: bool):
    """→ list of chosen POSITIONS (into the pool), identical to the
    numpy large-pool loop, or None when the kernel is unavailable."""
    _init()
    if _lib is None:
        return None
    m, dim = cand.shape
    cand = np.ascontiguousarray(cand, dtype=np.float32)
    n2 = np.ascontiguousarray(n2, dtype=np.float32)
    dists = np.ascontiguousarray(dists, dtype=np.float32)
    chosen, prow, occ = _buffers(m)
    nch = _lib.choose_large(
        cand.ctypes.data, n2.ctypes.data, dists.ctypes.data,
        m, dim, degree, float(alpha), float(inc), int(is_ip),
        _sgemv_addr, int(_sgemv_width64),
        chosen.ctypes.data, prow.ctypes.data, occ.ctypes.data,
    )
    return chosen[:nch].tolist()


def choose_small(ratio: np.ndarray, degree: int, alpha: float, inc: float):
    """→ list of chosen POSITIONS, identical to the numpy small-pool
    python loop over the precomputed ratio matrix, or None when the
    kernel is unavailable."""
    _init()
    if _lib is None:
        return None
    m = ratio.shape[0]
    ratio = np.ascontiguousarray(ratio, dtype=np.float32)
    chosen, _, occ = _buffers(m)
    nch = _lib.choose_small(
        ratio.ctypes.data, m, degree, float(alpha), float(inc),
        chosen.ctypes.data, occ.ctypes.data,
    )
    return chosen[:nch].tolist()
