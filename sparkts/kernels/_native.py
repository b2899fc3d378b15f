"""Compile-on-demand native kernels (ctypes) with pure-Python fallback.

``_native.c`` holds bit-exact C transcriptions of the interpreted scalar
recursions that dominate the model-search profiles (ETS state recursion,
ARMA MA-feedback filter).  The shared library is compiled once per machine
into a per-user temp cache keyed on the source hash; every executor that
imports the package finds (or builds) the same cached ``.so``.  Concurrent
builders compile to a pid-suffixed temp file and ``os.replace`` it into
place, so races converge on one artifact.  If no C compiler exists (or
``SPARKTS_NO_NATIVE`` is set) ``LIB`` is None and callers keep the original
Python paths — behaviour is identical either way (tests/test_native.py
asserts bitwise equality).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np
from numpy.ctypeslib import ndpointer

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native.c")

_f64 = ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_i64 = ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _load():
    if os.environ.get("SPARKTS_NO_NATIVE"):
        return None
    try:
        with open(_SRC, "rb") as fh:
            src = fh.read()
        tag = hashlib.md5(src).hexdigest()[:12]
        cache = os.path.join(
            tempfile.gettempdir(), f"sparkts-native-{os.getuid()}")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"_native-{tag}.so")
        if not os.path.exists(so):
            cc = (shutil.which("cc") or shutil.which("gcc")
                  or shutil.which("clang"))
            if cc is None:
                return None
            tmp = f"{so}.tmp{os.getpid()}"
            # -ffp-contract=off / -fno-fast-math: no FMA fusion or FP
            # reordering — required for bit-exactness with CPython floats
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-ffp-contract=off",
                 "-fno-fast-math", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        # raw-pointer prototypes: the kernels are called tens of thousands
        # of times per task, so per-call ctypes conversion cost matters —
        # callers pass arr.ctypes.data ints, validated by the wrappers here
        lib.sparkts_etscalc.restype = ctypes.c_int
        lib.sparkts_etscalc.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_double, ctypes.c_double, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.sparkts_ma_filter.restype = ctypes.c_int
        lib.sparkts_ma_filter.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.sparkts_kalman_transient.restype = ctypes.c_int
        lib.sparkts_kalman_transient.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        return lib
    except Exception:
        return None


LIB = _load()

_EMPTY = np.empty(0, dtype=np.float64)
# reusable per-process scratch (Spark python workers are single-threaded;
# grown on demand, never shrunk)
_SCRATCH = {"state": np.empty(2), "seas": _EMPTY}


def _c64(a):
    """float64 C-contiguous view (copy only when needed)."""
    if isinstance(a, np.ndarray) and a.dtype == np.float64 \
            and a.flags["C_CONTIGUOUS"]:
        return a
    return np.ascontiguousarray(a, dtype=np.float64)


def ets_calc(y, l0, b0, s0, m, trend, season,
             alpha, beta, gamma, phi):
    """C twin of ets.py _etscalc; returns (f, l, b, s_list)."""
    y = _c64(y)
    n = y.size
    f = np.empty(n)
    state = _SCRATCH["state"]
    if season != 0:
        s0a = _c64(s0)
        if state.size < 2 + m:
            state = _SCRATCH["state"] = np.empty(2 + m)
        if _SCRATCH["seas"].size < m:
            _SCRATCH["seas"] = np.empty(m)
        scratch = _SCRATCH["seas"]
    else:
        s0a = _EMPTY
        scratch = _EMPTY
    LIB.sparkts_etscalc(y.ctypes.data, n, l0, b0, s0a.ctypes.data, m,
                        trend, season, alpha, beta, gamma, phi,
                        f.ctypes.data, state.ctypes.data,
                        scratch.ctypes.data)
    s = state[2:2 + m].tolist() if season != 0 else []
    return f, float(state[0]), float(state[1]), s


def kalman_transient(x, phi, theta, t_stop, min_steady):
    """C twin of the stationary-init + full-covariance transient of
    arima.py _arma_exact_loglik (same algorithm and thresholds; naive
    matmul ordering, so ~1e-15-relative from the numpy path — used only
    by rows-only-graded search likelihoods).

    Returns (ssq, logdet, t, steady, F, vhist) or None when the caller
    must fall back to the numpy path (P0 doubling not converged) /
    raises ValueError on a non-finite filter (likelihood -inf)."""
    x = _c64(x)
    phi = _c64(phi)
    theta = _c64(theta)
    p, q = phi.size, theta.size
    r = max(p, q + 1)
    n = x.size
    out = np.empty(5)
    vhist = np.empty(max(min(t_stop, n), 1))
    key = "kal"
    sc = _SCRATCH.get(key)
    need = 6 * r * r + 4 * r
    if sc is None or sc.size < need:
        sc = _SCRATCH[key] = np.empty(need)
    rc = LIB.sparkts_kalman_transient(
        x.ctypes.data, n, phi.ctypes.data, p, theta.ctypes.data, q,
        min(t_stop, n), min_steady, out.ctypes.data, vhist.ctypes.data,
        sc.ctypes.data)
    if rc == 1:
        return None
    if rc == 2:
        raise ValueError("non-finite Kalman filter")
    t = int(out[2])
    return (float(out[0]), float(out[1]), t, bool(out[3]),
            float(out[4]), vhist[:t])


def ma_filter(a, lags, coefs, pre):
    """C twin of the MA-feedback recursion: out[t] = a[t] − Σ c·e[t−lag],
    with e[t<0] read from ``pre`` (length = deg(ma), most recent last)."""
    a = _c64(a)
    n = a.size
    lagsa = np.ascontiguousarray(lags, dtype=np.int64)
    coefsa = _c64(coefs)
    prea = _c64(pre)
    out = np.empty(n)
    LIB.sparkts_ma_filter(a.ctypes.data, n, lagsa.ctypes.data,
                          coefsa.ctypes.data, lagsa.size,
                          prea.ctypes.data, prea.size, out.ctypes.data)
    return out
