"""ctypes bindings for the C++ presolve core.

The reference binds its native presolve through pybind11
(Packages/papilo_wrapper.cpp, built by papilo_setup.py); this image has no
pybind11, so the core exposes a C ABI and is driven via ctypes.  The shared
library is built on demand with g++ -O2 and cached next to the source
(keyed by source mtime), so `pip`-less environments work out of the box.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np
import scipy.sparse as sp

from tpdlp.config import Status

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "core.cpp")
_LIB = None


def _build_lib() -> str:
    """Compile core.cpp to a cached shared library; rebuild when stale."""
    cache_dir = os.path.join(tempfile.gettempdir(), "tpdlp_native")
    os.makedirs(cache_dir, exist_ok=True)
    stamp = int(os.path.getmtime(_SRC))
    so_path = os.path.join(cache_dir, f"presolve_core_{stamp}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp"
        # -ffp-contract=off: GCC contracts a*b+c into FMA by default for
        # C++, which would break bit-level lockstep with the numpy engine
        # (the cross-tests compare reduction cascades at rtol=1e-12).
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
             "-ffp-contract=off", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(_build_lib())
    i64 = ctypes.c_int64
    p = ctypes.POINTER
    lib.tpdlp_presolve_run.restype = ctypes.c_void_p
    lib.tpdlp_presolve_run.argtypes = [
        i64, i64, i64,
        p(i64), p(ctypes.c_int32), p(ctypes.c_double),
        p(ctypes.c_double), p(ctypes.c_double), p(ctypes.c_double),
        p(ctypes.c_double), ctypes.c_int,
    ]
    for name, res in [
        ("tpdlp_status", ctypes.c_int),
        ("tpdlp_reduced_m", i64),
        ("tpdlp_reduced_n", i64),
        ("tpdlp_reduced_m_ineq", i64),
        ("tpdlp_reduced_nnz", i64),
        ("tpdlp_n_fixed", i64),
        ("tpdlp_rows_removed", i64),
        ("tpdlp_cols_removed", i64),
        ("tpdlp_passes", ctypes.c_int),
        ("tpdlp_obj_offset", ctypes.c_double),
    ]:
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = [ctypes.c_void_p]
    lib.tpdlp_get_reduced.restype = None
    lib.tpdlp_get_reduced.argtypes = [
        ctypes.c_void_p, p(i64), p(ctypes.c_int32), p(ctypes.c_double),
        p(ctypes.c_double), p(ctypes.c_double), p(ctypes.c_double),
        p(ctypes.c_double),
    ]
    lib.tpdlp_get_postsolve.restype = None
    lib.tpdlp_get_postsolve.argtypes = [
        ctypes.c_void_p, p(i64), p(i64), p(ctypes.c_double)
    ]
    lib.tpdlp_n_subst.restype = i64
    lib.tpdlp_n_subst.argtypes = [ctypes.c_void_p]
    lib.tpdlp_subst_nnz.restype = i64
    lib.tpdlp_subst_nnz.argtypes = [ctypes.c_void_p]
    lib.tpdlp_dcol_nnz.restype = i64
    lib.tpdlp_dcol_nnz.argtypes = [ctypes.c_void_p]
    lib.tpdlp_get_subst_ext.restype = None
    lib.tpdlp_get_subst_ext.argtypes = [
        ctypes.c_void_p, p(i64), p(ctypes.c_double), p(ctypes.c_int8),
        p(i64), p(i64), p(ctypes.c_double),
    ]
    lib.tpdlp_get_row_map.restype = None
    lib.tpdlp_get_row_map.argtypes = [ctypes.c_void_p, p(i64)]
    lib.tpdlp_get_subst.restype = None
    lib.tpdlp_get_subst.argtypes = [
        ctypes.c_void_p, p(i64), p(ctypes.c_double), p(ctypes.c_double),
        p(i64), p(i64), p(ctypes.c_double), p(ctypes.c_int8),
    ]
    lib.tpdlp_free.restype = None
    lib.tpdlp_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def presolve_cpp(problem, *, max_passes: int = 25):
    """Run the C++ presolve core; same result contract as the Python path."""
    from tpdlp.presolve.reductions import PostsolveData, PresolveResult
    from tpdlp.problem import LPProblem

    lib = _lib()
    K = sp.csr_matrix(
        problem.K.astype(np.float64)
        if sp.issparse(problem.K)
        else np.asarray(problem.K, np.float64)
    )
    K.sum_duplicates()
    m, n = K.shape
    indptr = np.asarray(K.indptr, np.int64)
    indices = np.ascontiguousarray(K.indices, np.int32)
    data = np.ascontiguousarray(K.data, np.float64)
    c = np.ascontiguousarray(problem.c, np.float64)
    q = np.ascontiguousarray(problem.q, np.float64)
    l = np.ascontiguousarray(problem.l, np.float64)
    u = np.ascontiguousarray(problem.u, np.float64)

    h = lib.tpdlp_presolve_run(
        m, n, problem.m_ineq,
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_double),
        _ptr(c, ctypes.c_double), _ptr(q, ctypes.c_double),
        _ptr(l, ctypes.c_double), _ptr(u, ctypes.c_double),
        max_passes,
    )
    try:
        status = Status(lib.tpdlp_status(h))
        rm = lib.tpdlp_reduced_m(h)
        rn = lib.tpdlp_reduced_n(h)
        nnz = lib.tpdlp_reduced_nnz(h)
        nfix = lib.tpdlp_n_fixed(h)

        col_map = np.empty(rn, np.int64)
        fixed_idx = np.empty(nfix, np.int64)
        fixed_val = np.empty(nfix, np.float64)
        lib.tpdlp_get_postsolve(
            h, _ptr(col_map, ctypes.c_int64), _ptr(fixed_idx, ctypes.c_int64),
            _ptr(fixed_val, ctypes.c_double),
        )
        n_subst = lib.tpdlp_n_subst(h)
        subst_nnz = lib.tpdlp_subst_nnz(h)
        subst_kind = np.empty(n_subst, np.int8)
        subst_idx = np.empty(n_subst, np.int64)
        subst_scale = np.empty(n_subst, np.float64)
        subst_rhs = np.empty(n_subst, np.float64)
        subst_indptr = np.empty(n_subst + 1, np.int64)
        subst_cols = np.empty(subst_nnz, np.int64)
        subst_vals = np.empty(subst_nnz, np.float64)
        lib.tpdlp_get_subst(
            h, _ptr(subst_idx, ctypes.c_int64),
            _ptr(subst_scale, ctypes.c_double),
            _ptr(subst_rhs, ctypes.c_double),
            _ptr(subst_indptr, ctypes.c_int64),
            _ptr(subst_cols, ctypes.c_int64),
            _ptr(subst_vals, ctypes.c_double),
            _ptr(subst_kind, ctypes.c_int8),
        )
        dcol_nnz = lib.tpdlp_dcol_nnz(h)
        subst_row = np.empty(n_subst, np.int64)
        subst_cj = np.empty(n_subst, np.float64)
        subst_flag = np.empty(n_subst, np.int8)
        dcol_indptr = np.empty(n_subst + 1, np.int64)
        dcol_rows = np.empty(dcol_nnz, np.int64)
        dcol_vals = np.empty(dcol_nnz, np.float64)
        lib.tpdlp_get_subst_ext(
            h, _ptr(subst_row, ctypes.c_int64),
            _ptr(subst_cj, ctypes.c_double),
            _ptr(subst_flag, ctypes.c_int8),
            _ptr(dcol_indptr, ctypes.c_int64),
            _ptr(dcol_rows, ctypes.c_int64),
            _ptr(dcol_vals, ctypes.c_double),
        )
        row_map = np.empty(rm, np.int64)
        lib.tpdlp_get_row_map(h, _ptr(row_map, ctypes.c_int64))
        data_out = PostsolveData(
            n_orig=problem.n,
            m_orig=problem.m,
            col_map=col_map,
            fixed_idx=fixed_idx,
            fixed_val=fixed_val,
            obj_offset=lib.tpdlp_obj_offset(h),
            subst_kind=subst_kind,
            subst_idx=subst_idx,
            subst_scale=subst_scale,
            subst_rhs=subst_rhs,
            subst_indptr=subst_indptr,
            subst_cols=subst_cols,
            subst_vals=subst_vals,
            row_map=row_map,
            subst_row=subst_row,
            subst_cj=subst_cj,
            subst_flag=subst_flag,
            dcol_indptr=dcol_indptr,
            dcol_rows=dcol_rows,
            dcol_vals=dcol_vals,
        )
        rows_removed = lib.tpdlp_rows_removed(h)
        cols_removed = lib.tpdlp_cols_removed(h)
        passes = lib.tpdlp_passes(h)

        if status != Status.RUNNING:
            return PresolveResult(
                None, data_out, status, rows_removed, cols_removed, passes
            )

        r_indptr = np.empty(rm + 1, np.int64)
        r_indices = np.empty(nnz, np.int32)
        r_data = np.empty(nnz, np.float64)
        r_c = np.empty(rn, np.float64)
        r_q = np.empty(rm, np.float64)
        r_l = np.empty(rn, np.float64)
        r_u = np.empty(rn, np.float64)
        lib.tpdlp_get_reduced(
            h, _ptr(r_indptr, ctypes.c_int64), _ptr(r_indices, ctypes.c_int32),
            _ptr(r_data, ctypes.c_double), _ptr(r_c, ctypes.c_double),
            _ptr(r_q, ctypes.c_double), _ptr(r_l, ctypes.c_double),
            _ptr(r_u, ctypes.c_double),
        )
        reduced = LPProblem(
            c=r_c,
            K=sp.csr_matrix(
                (r_data, r_indices, r_indptr), shape=(rm, rn)
            ),
            q=r_q,
            m_ineq=int(lib.tpdlp_reduced_m_ineq(h)),
            l=r_l,
            u=r_u,
            name=problem.name + "+presolved",
            obj_offset=problem.obj_offset + data_out.obj_offset,
        )
        return PresolveResult(
            reduced, data_out, status, rows_removed, cols_removed, passes
        )
    finally:
        lib.tpdlp_free(h)
