"""Cubic <-> spherical harmonic basis transforms and angular-momentum ops.

The 9-orbital spd blocks are assembled in cubic (real) harmonics
(s, x, y, z, xy, yz, zx, x^2-y^2, 3z^2-r^2) and transformed to the complex
spherical-harmonic basis Y(lm) ordered (00)(1-1)(10)(11)(2-2)(2-1)(20)(21)(22)
— reference ``source/math.f90 hcpx`` :1508-1576 and the L_x/L_y/L_z operator
constants :133-200.
"""

from __future__ import annotations

import numpy as np

_C = 1.0 / np.sqrt(2.0)
_I = 1.0j

# V: cubic -> spherical transform, VC = V^H (reference 'v' and 'vc')
V = np.zeros((9, 9), dtype=np.complex128)
V[0, 0] = 1.0
# p block
V[1, 3] = -_C
V[1, 1] = _C
V[2, 3] = _I * _C
V[2, 1] = _I * _C
V[3, 2] = 1.0
# d block
V[4, 4] = _I * _C
V[4, 8] = -_I * _C
V[5, 5] = _I * _C
V[5, 7] = _I * _C
V[6, 5] = _C
V[6, 7] = -_C
V[7, 4] = _C
V[7, 8] = _C
V[8, 6] = 1.0

VC = V.conj().T.copy()


def cart2sph(h: np.ndarray) -> np.ndarray:
    """Transform 9x9 block(s) from cubic to spherical harmonics.

    Accepts (..., 9, 9); returns ``VC @ h @ V`` (reference ``hcpx``
    'cart2sph' branch).
    """
    return VC @ np.asarray(h, dtype=np.complex128) @ V


def sph2cart(h: np.ndarray) -> np.ndarray:
    return V @ np.asarray(h, dtype=np.complex128) @ VC


def _lops() -> tuple:
    """Angular momentum operators in the cubic basis (math.f90 L_x/L_y/L_z).

    The Fortran reshape fills column-major: element k of the literal list is
    L(mod(k,9)+1, k//9+1), i.e. the rows below are *columns* of L.
    """
    s3 = np.sqrt(3.0)
    lx_cols = np.zeros((9, 9))
    lx_cols[2, 3] = -1.0  # column 3 (x): row z
    lx_cols[3, 2] = 1.0
    lx_cols[4, 6] = -1.0
    lx_cols[5, 7] = -1.0
    lx_cols[5, 8] = -s3
    lx_cols[6, 4] = 1.0
    lx_cols[7, 5] = 1.0
    lx_cols[8, 5] = s3
    ly_cols = np.zeros((9, 9))
    ly_cols[1, 3] = 1.0
    ly_cols[3, 1] = -1.0
    ly_cols[4, 5] = 1.0
    ly_cols[5, 4] = -1.0
    ly_cols[6, 7] = -1.0
    ly_cols[6, 8] = s3
    ly_cols[7, 6] = 1.0
    ly_cols[8, 6] = -s3
    lz_cols = np.zeros((9, 9))
    lz_cols[1, 2] = -1.0
    lz_cols[2, 1] = 1.0
    lz_cols[4, 7] = 2.0
    lz_cols[5, 6] = 1.0
    lz_cols[6, 5] = -1.0
    lz_cols[7, 4] = -2.0
    return tuple((-1j) * m.T for m in (lx_cols, ly_cols, lz_cols))


#: L operators in the cubic basis, complex (factor -i included)
L_X, L_Y, L_Z = _lops()
