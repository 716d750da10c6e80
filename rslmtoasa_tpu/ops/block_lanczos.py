"""Block-Lanczos recursion with 18x18 block coefficients.

TPU-first re-design of the reference block recursion
(``source/recursion.f90`` ``recur_b`` :1807, ``crecal_b`` :1873,
``hop_b`` :1560, ``hop_b_hoh`` :1411):

* per recursion level: block SpMV over the cluster, block coefficient
  A_n = sum_i psi_i^H (H psi)_i, residual update, B_{n+1} = sqrt(B^2)
  via an eigendecomposition, psi update with B^{-1};
* the per-atom loop becomes a leading batch axis (R start blocks recur
  simultaneously, batched ``eigh``);
* the HoH overlap correction H = h - h*obar*h + enim + l.s follows
  ``hop_b_hoh``: a second SpMV with the ``eeo`` blocks applied to
  ``h|psi>`` plus onsite ``enim``/``lsham`` terms.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _spmv18(hs: jnp.ndarray, iz: jnp.ndarray, cols: jnp.ndarray,
            psi: jnp.ndarray) -> jnp.ndarray:
    """y[r, i] = sum_m H[iz[i], m] @ psi[r, cols[i, m]].

    hs: (ntype, nslots, 18, 18); psi: (R, kk+1, 18, 18) zero-padded row.
    """
    hi = hs[iz]  # (kk, nslots, 18, 18)
    pg = psi[:, cols]  # (R, kk, nslots, 18, 18)
    return jnp.einsum("imab,rimbc->riac", hi, pg)


def _onsite18(mat: jnp.ndarray, iz: jnp.ndarray, psi: jnp.ndarray
              ) -> jnp.ndarray:
    """y[r, i] = mat[iz[i]] @ psi[r, i] (onsite block application)."""
    mi = mat[iz]  # (kk, 18, 18)
    return jnp.einsum("iab,ribc->riac", mi, psi[:, :-1])


def _eig_sqrt(b2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """B = U sqrt(ev) U^H and B^-1 from the Hermitian eigendecomposition
    (crecal_b :1977-1999, zheev-based square root)."""
    ev, u = jnp.linalg.eigh(b2)
    lam = jnp.sqrt(ev.astype(b2.dtype))
    b = jnp.einsum("...ab,...b,...cb->...ac", u, lam, u.conj())
    b_i = jnp.einsum("...ab,...b,...cb->...ac", u, 1.0 / lam, u.conj())
    return b, b_i


@partial(jax.jit, static_argnames=("lld", "hoh"))
def block_lanczos(
    hs: jnp.ndarray,  # (nrows, nslots, 18, 18) block-row table
    lsham: jnp.ndarray,  # (ntype, 18, 18) SOC (zeros if disabled)
    iz: jnp.ndarray,  # per-atom row index into hs
    cols: jnp.ndarray,
    psi0: jnp.ndarray,  # (R, kk+1, 18, 18) start blocks, zero pad row
    lld: int,
    hoh: bool = False,
    hso: Optional[jnp.ndarray] = None,  # (nrows, nslots, 18, 18) eeo blocks
    enim: Optional[jnp.ndarray] = None,  # (ntype, 18, 18)
    iz_onsite: Optional[jnp.ndarray] = None,  # species index for onsite ops
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the block recursion; returns (a_b, b2_b) of shape
    (lld, R, 18, 18) with the reference conventions: b2_b[0] = I,
    a_b[lld-1] = 0, b2_b[lld-1] = last residual Gram matrix."""
    r, kk1 = psi0.shape[0], psi0.shape[1]
    eye = jnp.eye(18, dtype=psi0.dtype)
    izo = iz if iz_onsite is None else iz_onsite

    def apply_h(psi):
        if hoh:
            hpsi = _spmv18(hs, iz, cols, psi)
            hpsi_pad = jnp.concatenate(
                [hpsi, jnp.zeros((r, 1, 18, 18), psi.dtype)], axis=1
            )
            hohpsi = _spmv18(hso, iz, cols, hpsi_pad)
            enupsi = _onsite18(enim, izo, psi)
            socpsi = _onsite18(lsham, izo, psi)
            return hpsi - hohpsi + enupsi + socpsi
        # non-HoH: lsham folds into the onsite slot
        hpsi = _spmv18(hs, iz, cols, psi)
        return hpsi + _onsite18(lsham, izo, psi)

    def step(carry, _):
        psi, pmn, sum_b_prev = carry
        hpsi = apply_h(psi)
        a_ll = jnp.einsum("riba,ribc->rac", psi[:, :-1].conj(), hpsi)
        pmn = hpsi - pmn
        pmn = pmn - jnp.einsum("riab,rbc->riac", psi[:, :-1], a_ll)
        b2 = jnp.einsum("riba,ribc->rac", pmn.conj(), pmn)
        b, b_i = _eig_sqrt(b2)
        psi_new = jnp.einsum("riab,rbc->riac", pmn, b_i)
        pmn_new = jnp.einsum("riab,rbc->riac", psi[:, :-1], b)
        psi_new = jnp.concatenate(
            [psi_new, jnp.zeros((r, 1, 18, 18), psi.dtype)], axis=1
        )
        return (psi_new, pmn_new, b2), (a_ll, sum_b_prev)

    pmn0 = jnp.zeros((r, kk1 - 1, 18, 18), dtype=psi0.dtype)
    sum_b0 = jnp.broadcast_to(eye, (r, 18, 18))
    (psi, pmn, sum_b), (a_b, b2_b) = jax.lax.scan(
        step, (psi0, pmn0, sum_b0), None, length=lld - 1
    )
    a_b = jnp.concatenate([a_b, jnp.zeros((1, r, 18, 18), a_b.dtype)], axis=0)
    b2_b = jnp.concatenate([b2_b, sum_b[None]], axis=0)
    return a_b, b2_b


def block_start_vectors(kk: int, atom_indices) -> np.ndarray:
    """Identity start blocks per atom: psi0 (R, kk+1, 18, 18)."""
    r = len(atom_indices)
    psi0 = np.zeros((r, kk + 1, 18, 18), dtype=np.complex128)
    for a, j in enumerate(atom_indices):
        psi0[a, j] = np.eye(18)
    return psi0


def zsqr(b2_b: np.ndarray) -> np.ndarray:
    """Replace every B^2 block by its Hermitian square root
    (``zsqr`` :1980-2028).  b2_b: (lld, R, 18, 18)."""
    ev, u = np.linalg.eigh(b2_b)
    lam = np.sqrt(ev)
    return np.einsum("...ab,...b,...cb->...ac", u, lam, u.conj())
