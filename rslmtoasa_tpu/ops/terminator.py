"""Beer-Pettifor terminator optimisation for Haydock chains.

Host-side re-implementation of the reference ``bpopt`` (``recursion.f90``
:3540-3588) and ``emami`` (:3589-3713): find the asymptotic (a_inf, b_inf)
of a finite tridiagonal chain by iteratively centering the chain and
bisecting for the extremal eigenvalues of the symmetric tridiagonal matrix
(Sturm-sequence counts).  The empirical band-edge handling of
``dos%density`` (:248-370) — the 1.01 beta scaling for s-orbitals — is
applied by the caller.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def emami(a: np.ndarray, b: np.ndarray, n: int) -> Tuple[float, float]:
    """Extremal eigenvalues of the sym. tridiagonal (diag a, offdiag b).

    ``b[i]`` couples levels i-1 and i in the reference's 1-based convention:
    b(1) is ignored (zeroed).  Exact port of the bisection with its 50-step
    cap and relative tolerance.
    """
    a = np.asarray(a, dtype=np.float64)
    bb = np.array(b, dtype=np.float64, copy=True)
    bb = np.concatenate([bb, [0.0]])
    bb[0] = 0.0
    relfeh = 2.0 ** (-39)
    eps = 1.0e-6

    x1 = a[:n] + np.abs(bb[:n]) + np.abs(bb[1 : n + 1])
    x2 = a[:n] - np.abs(bb[:n]) - np.abs(bb[1 : n + 1])
    emax0 = float(x1.max())
    emin0 = float(x2.min())

    def sturm_count(e: float) -> int:
        num = 0
        p = a[0] - e
        if p < 0.0:
            num += 1
        for i in range(1, n):
            if p == 0.0:
                p = (a[i] - e) - abs(bb[i]) / relfeh
            else:
                p = (a[i] - e) - bb[i] ** 2 / p
            if p < 0.0:
                num += 1
        return num

    # phase 1: largest eigenvalue
    emax, emin = emax0, emin0
    e = 0.5 * (emax + emin)
    for _ in range(50):
        e = 0.5 * (emax + emin)
        num = sturm_count(e)
        if num == n:
            emax = e
        if num < n:
            emin = e
        mid = 0.5 * (emax + emin)
        if mid != 0.0 and abs((emax - emin) / mid) <= eps:
            break
    else:
        return emax, emin  # cap hit: reference goto 1000 leaves current vals
    e1 = e
    # phase 2: smallest eigenvalue
    emax, emin = e1, emin0
    for _ in range(50):
        e = 0.5 * (emax + emin)
        num = sturm_count(e)
        if num == 0:
            emin = e
        if num > 0:
            emax = e
        mid = 0.5 * (emax + emin)
        if mid != 0.0 and abs((emax - emin) / mid) <= eps:
            break
    else:
        return emax, emin
    e2 = e
    return e1, e2


def bpopt(a: np.ndarray, rb: np.ndarray, n: int) -> Tuple[float, float, int]:
    """Pettifor terminator (a_inf, b_inf) for one chain.

    ``a`` are the lld diagonal coefficients, ``rb`` the lld sqrt(b2)
    off-diagonals, ``n`` the number of levels used (reference passes
    ``lld - 1``).  Returns (ainf, rbinf, ifail).
    """
    a = np.asarray(a, dtype=np.float64)
    rb = np.asarray(rb, dtype=np.float64)
    eps = 1.0e-5
    ainf = a[n - 1]
    az = np.zeros(len(a))
    rbz = np.zeros(len(a))
    ifail = 0
    jiter = 0
    bmax = bmin = 0.0
    while True:
        jiter += 1
        az[0] = 0.5 * (a[0] - ainf)
        az[1 : n - 1] = 0.5 * (a[1 : n - 1] - ainf)
        rbz[1 : n - 1] = 0.5 * rb[1 : n - 1]
        az[n - 1] = a[n - 1] - ainf
        rbz[n - 1] = rb[n - 1] / np.sqrt(2.0)
        bmax, bmin = emami(az, rbz, n)
        bm = abs(bmax + bmin)
        ainf = ainf + (bmax + bmin)
        if bm <= eps:
            break
        if jiter > 300:
            ifail = 1
            break
    rbinf = (bmax - bmin) / 2.0
    return float(ainf), float(rbinf), ifail
