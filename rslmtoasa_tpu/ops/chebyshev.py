"""Chebyshev/KPM block-moment recursion and Green-function reconstruction.

Reference: ``recursion.f90`` ``chebyshev_recur`` :3057-3135 (double-pass
moment trick mu_{2n+1} = 2<phi_n|phi_n> - mu_1, mu_{2n+2} =
2<phi_{n+1}|phi_n> - mu_2), ``cheb_0th_mom``/``cheb_1st_mom`` :2145-2239,
``chebyshev_recur_ll`` :2495-2604 (+ ``_hoh`` variant), and
``green.f90 chebyshev_green`` :1030-1115 (Jackson kernel x moments x
-i exp(-i n arccos w) / sqrt(a^2 - (E-b)^2)).

The Hamiltonian is scaled as H~ = (H - b)/a with
a = (emax - emin)/(2 - 0.3), b = (emax + emin)/2.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_lanczos import _onsite18, _spmv18, gram_sum


@partial(jax.jit, static_argnames=("lld", "hoh"))
def chebyshev_moments(
    hs: jnp.ndarray,
    lsham: jnp.ndarray,
    iz: jnp.ndarray,
    cols: jnp.ndarray,
    psi0: jnp.ndarray,  # (R, kk+1, 18, 18)
    lld: int,
    a: float,
    b: float,
    hoh: bool = False,
    hso: Optional[jnp.ndarray] = None,
    enim: Optional[jnp.ndarray] = None,
    iz_onsite: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Block Chebyshev moments mu_n of shape (2*lld+2, R, d, d)
    (d = 18 complex, 36 realified)."""
    r = psi0.shape[0]
    d = psi0.shape[-1]
    izo = iz if iz_onsite is None else iz_onsite

    def apply_h(psi):
        """(H psi - b psi)/a with onsite lsham (and HoH corrections)."""
        if hoh:
            hpsi = _spmv18(hs, iz, cols, psi)
            hpsi_pad = jnp.concatenate(
                [hpsi, jnp.zeros((r, 1, d, d), psi.dtype)], axis=1
            )
            hohpsi = _spmv18(hso, iz, cols, hpsi_pad)
            hpsi = hpsi - hohpsi + _onsite18(enim, izo, psi) \
                + _onsite18(lsham, izo, psi)
        else:
            hpsi = _spmv18(hs, iz, cols, psi) + _onsite18(lsham, izo, psi)
        return (hpsi - b * psi[:, :-1]) / a

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((r, 1, d, d), x.dtype)], axis=1
        )

    mu0 = gram_sum(psi0[:, :-1].conj(), psi0[:, :-1])
    psi1 = pad(apply_h(psi0))
    mu1 = gram_sum(psi0[:, :-1].conj(), psi1[:, :-1])

    def step(carry, _):
        p0, p1 = carry
        p2 = 2.0 * apply_h(p1) - p0[:, :-1]
        d1 = gram_sum(p1[:, :-1].conj(), p1[:, :-1])
        d2 = gram_sum(p2.conj(), p1[:, :-1])
        mu_odd = 2.0 * d1 - mu0
        mu_even = 2.0 * d2 - mu1
        return (p1, pad(p2)), (mu_odd, mu_even)

    (_, _), (mu_odd, mu_even) = jax.lax.scan(
        step, (psi0, psi1), None, length=lld
    )
    # interleave: [mu0, mu1, mu2=odd(0), mu3=even(0), mu4=odd(1), ...]
    mu = jnp.zeros((2 * lld + 2, r, d, d), dtype=psi0.dtype)
    mu = mu.at[0].set(mu0).at[1].set(mu1)
    mu = mu.at[2::2].set(mu_odd)
    mu = mu.at[3::2].set(mu_even)
    return mu


def jackson_kernel(n: int) -> np.ndarray:
    """Jackson kernel of order n (math.f90 ``jackson_kernel`` :1641-1661)."""
    ll = np.arange(1, n + 1, dtype=np.float64)
    theta = np.pi * (ll - 1) / (n + 1)
    k = (n - (ll - 1) + 1) * np.cos(theta) \
        + np.sin(theta) / np.tan(np.pi / (n + 1))
    return k / (n + 1)


def lorentz_kernel(n: int, lam: float = 4.0) -> np.ndarray:
    """Lorentz kernel (math.f90 :1663-1677)."""
    ll = np.arange(1, n + 1, dtype=np.float64)
    theta = lam * (1.0 - (ll - 1) / n)
    return np.sinh(theta) / np.sinh(lam)


def chebyshev_green(mu: np.ndarray, ene: np.ndarray, emin: float,
                    emax: float) -> np.ndarray:
    """Onsite Green function from block moments.

    mu: (nmom, 18, 18) for one atom; returns g0 (18, 18, NE)
    (``green.f90 chebyshev_green`` :1030-1115).
    """
    nmom = mu.shape[0]
    a = (emax - emin) / (2.0 - 0.3)
    b = (emax + emin) / 2.0
    w = (ene - b) / a  # (NE,)
    kern = jackson_kernel(nmom)
    mu_ng = mu * kern[:, None, None]
    mu_ng[1:] *= 2.0
    n_idx = np.arange(nmom)
    # exp factor: -i exp(-i n arccos(w)), (NE, nmom)
    acw = np.arccos(np.clip(w, -1.0, 1.0))
    # the reference computes arccos without clipping; |w| stays < 1 by the
    # (2 - 0.3) scaling margin, so the clip is inert on valid meshes
    expf = -1j * np.exp(-1j * n_idx[None, :] * acw[:, None])
    g0 = np.einsum("en,nab->abe", expf, mu_ng)
    g0 /= np.sqrt(a**2 - (ene - b) ** 2)[None, None, :]
    return g0


def chebyshev_moments_split(hs, lsham, iz, cols, psi0, lld, a, b,
                            hoh=False, hso=None, enim=None,
                            iz_onsite=None):
    """Realified Chebyshev moments for backends without complex dtypes
    (see ops.block_lanczos realify notes).  Complex in/out."""
    import jax.numpy as jnp
    import numpy as np

    from .block_lanczos import realify_blocks, unrealify_blocks

    mu = chebyshev_moments(
        jnp.asarray(realify_blocks(hs)),
        jnp.asarray(realify_blocks(lsham)),
        jnp.asarray(iz), jnp.asarray(cols),
        jnp.asarray(realify_blocks(psi0)),
        lld, a, b, hoh=hoh,
        hso=jnp.asarray(realify_blocks(hso)) if hso is not None else None,
        enim=(jnp.asarray(realify_blocks(enim))
              if enim is not None else None),
        iz_onsite=(jnp.asarray(iz_onsite)
                   if iz_onsite is not None else None),
    )
    return unrealify_blocks(np.asarray(mu))
