"""Batched scalar (Haydock) Lanczos recursion on the block-ELL Hamiltonian.

TPU-first re-design of the reference scalar recursion
(``source/recursion.f90`` ``recur`` :3485, ``crecal`` :3423, ``hop`` :3310):

* the per-(atom, orbital) chain loop becomes a *batch axis* — all 9 orbitals
  x 2 spins x nrec atoms recur simultaneously;
* the recursion-depth loop is a single ``lax.scan``;
* the masked neighbor-map SpMV is a gather + batched 9x9 block matmul over
  canonical slots.  The reference's ``izero`` active-set masking is purely a
  CPU work-saving device: vectors are exactly zero outside the active set, so
  the unmasked dense-batch SpMV produces identical numbers.

Missing neighbors use the sentinel column ``kk``; ``psi`` carries one extra
zero row so gathers need no masking.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def block_spmv(hs: jnp.ndarray, iz: jnp.ndarray, cols: jnp.ndarray,
               psi: jnp.ndarray) -> jnp.ndarray:
    """y[i] = sum_m H[iz[i], m] @ psi[cols[i, m]].

    Parameters
    ----------
    hs :   (ntype, nslots, B, B) complex block table
    iz :   (kk,) type index per atom
    cols : (kk, nslots) neighbor columns (sentinel kk = missing)
    psi :  (kk+1, B, C) wavefront block vectors, row kk all-zero

    Returns (kk, B, C).

    One-shot gather + einsum over all slots (a slot-loop compiles far
    worse on TPU backends and fuses less).
    """
    hi = hs[iz]  # (kk, nslots, B, B)
    pg = psi[cols]  # (kk, nslots, B, C)
    return jnp.einsum("imab,imbc->iac", hi, pg)


@partial(jax.jit, static_argnames=("lld",))
def lanczos_coefficients(
    hs: jnp.ndarray,
    iz: jnp.ndarray,
    cols: jnp.ndarray,
    psi0: jnp.ndarray,
    lld: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``lld`` Haydock recursion steps for a batch of start vectors.

    ``psi0`` is (kk+1, B, C) with unit start vectors in the chain columns
    (row kk must be zero).  Returns ``(a, b2)`` of shape (lld, C): the
    tridiagonal coefficients per chain, with the reference's conventions
    ``b2[0] = 1``, ``a[lld-1] = 0`` and ``b2[lld-1] = |r|^2`` of the last
    residual (``crecal`` :3423-3483).
    """
    kk1, b, c = psi0.shape

    def step(carry, _):
        psi, pmn, summ_prev = carry
        v = block_spmv(hs, iz, cols, psi)
        a_ll = jnp.sum(v.real * psi[:-1].real + v.imag * psi[:-1].imag,
                       axis=(0, 1))
        b2_ll = summ_prev
        pmn = pmn + v - a_ll[None, None, :] * psi[:-1]
        summ = jnp.sum(pmn.real**2 + pmn.imag**2, axis=(0, 1))
        s = jnp.sqrt(summ)
        psi_new = jnp.concatenate(
            [pmn / s[None, None, :], jnp.zeros((1, b, c), pmn.dtype)], axis=0
        )
        pmn_new = -psi[:-1] * s[None, None, :]
        return (psi_new, pmn_new, summ), (a_ll, b2_ll)

    pmn0 = jnp.zeros((kk1 - 1, b, c), dtype=psi0.dtype)
    summ0 = jnp.ones((c,), dtype=jnp.float64)
    (psi, pmn, summ), (a, b2) = jax.lax.scan(
        step, (psi0, pmn0, summ0), None, length=lld - 1
    )
    a = jnp.concatenate([a, jnp.zeros((1, c), a.dtype)], axis=0)
    b2 = jnp.concatenate([b2, summ[None, :]], axis=0)
    return a, b2


def split_complex(x) -> jnp.ndarray:
    """complex(..., ) -> real(2, ...) with [0]=re, [1]=im.

    TPU backends (v5e) have no native C128; all device math runs on the
    split representation with f64 real arithmetic — bit-compatible with
    the complex128 path (a complex MAC is exactly 4 real MACs).  The split
    happens host-side (NumPy) so no complex array ever reaches the device.
    """
    import numpy as np

    x = np.asarray(x)
    return jnp.asarray(np.stack([x.real, x.imag], axis=0))


def merge_complex(x: jnp.ndarray) -> jnp.ndarray:
    return x[0] + 1j * x[1]


def block_spmv_split(hs: jnp.ndarray, iz: jnp.ndarray, cols: jnp.ndarray,
                     psi: jnp.ndarray) -> jnp.ndarray:
    """Split-complex block SpMV.

    hs: (2, ntype, nslots, B, B) real; psi: (2, kk+1, B, C) real with zero
    pad row.  Returns (2, kk, B, C).
    """
    hr = hs[0][iz]  # (kk, nslots, B, B)
    hi_ = hs[1][iz]
    pr = psi[0][cols]  # (kk, nslots, B, C)
    pi = psi[1][cols]
    yr = jnp.einsum("imab,imbc->iac", hr, pr) \
        - jnp.einsum("imab,imbc->iac", hi_, pi)
    yi = jnp.einsum("imab,imbc->iac", hr, pi) \
        + jnp.einsum("imab,imbc->iac", hi_, pr)
    return jnp.stack([yr, yi], axis=0)


@partial(jax.jit, static_argnames=("lld",))
def lanczos_coefficients_split(
    hs: jnp.ndarray,
    iz: jnp.ndarray,
    cols: jnp.ndarray,
    psi0: jnp.ndarray,
    lld: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Haydock recursion in the split-complex representation.

    hs: (2, ntype, nslots, B, B); psi0: (2, kk+1, B, C) with zero pad row.
    Returns (a, b2) of shape (lld, C) — identical to
    :func:`lanczos_coefficients` up to f64 rounding.
    """
    _, kk1, b, c = psi0.shape

    def step(carry, _):
        psi, pmn, summ_prev = carry
        v = block_spmv_split(hs, iz, cols, psi)
        a_ll = jnp.sum(v[0] * psi[0, :-1] + v[1] * psi[1, :-1], axis=(0, 1))
        b2_ll = summ_prev
        pmn = pmn + v - a_ll[None, None, None, :] * psi[:, :-1]
        summ = jnp.sum(pmn * pmn, axis=(0, 1, 2))
        s = jnp.sqrt(summ)
        psi_new = jnp.concatenate(
            [pmn / s[None, None, None, :],
             jnp.zeros((2, 1, b, c), pmn.dtype)], axis=1
        )
        pmn_new = -psi[:, :-1] * s[None, None, None, :]
        return (psi_new, pmn_new, summ), (a_ll, b2_ll)

    pmn0 = jnp.zeros((2, kk1 - 1, b, c), dtype=psi0.dtype)
    summ0 = jnp.ones((c,), dtype=psi0.dtype)
    (psi, pmn, summ), (a, b2) = jax.lax.scan(
        step, (psi0, pmn0, summ0), None, length=lld - 1
    )
    a = jnp.concatenate([a, jnp.zeros((1, c), a.dtype)], axis=0)
    b2 = jnp.concatenate([b2, summ[None, :]], axis=0)
    return a, b2


def scalar_start_vectors(kk: int, atom_indices, dtype=jnp.complex128
                         ) -> jnp.ndarray:
    """Unit start vectors for the scalar recursion: one chain per
    (atom, orbital) pair; orbital runs fastest (matches ``recur``'s l-loop).

    Returns (kk+1, 9, C) with C = 9 * len(atom_indices) laid out as
    chain ``c = a * 9 + l`` for atom ``a``, orbital ``l``.
    """
    import numpy as np

    n = len(atom_indices)
    psi0 = np.zeros((kk + 1, 9, 9 * n), dtype=np.complex128)
    for a, j in enumerate(atom_indices):
        for l in range(9):
            psi0[j, l, a * 9 + l] = 1.0
    return psi0  # host array; callers move it to device (complex is split
    # host-side first on TPU backends without C128)
