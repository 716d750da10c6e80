"""Fused Pallas TPU kernel for the df64 bucket-conv SpMV.

The XLA conv lowering of :mod:`.stencil_conv` re-reads the chunked
wavefront once per tap (27x) from HBM — measured HBM-bound at ~31 ms per
step on the bench workload, with another ~10 ms for the separate bucket
recombination pass.  This kernel is the speed-of-light rewrite the
survey planned (SURVEY §7): the spatial box is flattened to padded
(plane, row) form so every stencil tap becomes a STATIC column shift,
and each grid step

  * keeps the 27-tap bucket kernel resident in VMEM (857 KB),
  * reads three input planes (the dx = -1..1 window) once,
  * runs 27 MXU GEMMs  (QD, QD) @ (QD, WIDTH)  accumulating in f32,
  * recombines the df64 buckets + applies the cluster mask IN-KERNEL,
    writing only the (d, roww) hi/lo pair — ~3.5x less output traffic
    than the bucket tensor.

Flat-padded layout: cell (ix, iy, iz) of the (nx, ny, nz) box lives at
plane ``ix + 1``, column ``MARG + (iy+1)*(nz+2) + (iz+1)`` of a
(C, nxp, D, roww) array with a zero shell on every face; a tap
(dx, dy, dz) is a read of plane ``p + dx`` at column shift
``dy*(nz+2) + dz`` — in bounds because ``MARG >= nz + 3``.  Shells and
margins stay exactly zero through the recursion (the kernel masks its
outputs), so elementwise df64 ops and the chain dots run on the flat
arrays unchanged.

Reference: the neighbor-map SpMV ``hop``/``chebyshev_recur_ll``
(``source/recursion.f90:3310,2495``); df64 composition as in
:mod:`.stencil_conv` (same chunk grids, same ~1e-13 accuracy).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64
from .df64 import ds_add, ds_mul, ds_recip, ds_sqrt, fast_two_sum, two_sum
from .stencil_conv import ds_dot_chain, pack_conv_kernel_df64

MARG = 64  # column margin; must be >= nz + 3


@dataclass
class FlatStencil:
    """Flat-padded embedding of a single-site cluster box."""

    nxp: int  # nx + 2 planes
    roww: int  # padded row width (multiple of 128), incl. both margins
    width: int  # computed column span = roww - 2*MARG
    planes: np.ndarray  # (kk,) plane index per atom
    cols: np.ndarray  # (kk,) flat column per atom
    mask: np.ndarray  # (nxp, roww) f32, 1 on cluster cells
    kk: int
    dims: Tuple[int, int, int]


def build_flat_stencil(st) -> FlatStencil:
    """From a :class:`.stencil_conv.ConvStencil` box embedding."""
    nx, ny, nz = st.dims
    nyp, nzp = ny + 2, nz + 2
    if MARG < nz + 3:
        raise ValueError("box nz too large for the MARG column margin")
    ncols = MARG + nyp * nzp + MARG
    roww = -(-ncols // 128) * 128
    width = roww - 2 * MARG
    planes = st.coords[:, 0] + 1
    cols = MARG + (st.coords[:, 1] + 1) * nzp + (st.coords[:, 2] + 1)
    mask = np.zeros((nx + 2, roww), np.float32)
    mask[planes, cols] = 1.0
    return FlatStencil(nxp=nx + 2, roww=roww, width=width, planes=planes,
                       cols=cols, mask=mask, kk=st.kk, dims=st.dims)


def flat_start_vectors(fs: FlatStencil, atom_indices, d: int,
                       orbitals=None):
    """df64 start vectors on the flat grid: (C, nxp, d, roww) pairs;
    chain c = atom * norb + orbital (orbital fastest)."""
    orbitals = list(range(d // 2)) if orbitals is None else list(orbitals)
    norb = len(orbitals)
    c = len(atom_indices) * norb
    hi = np.zeros((c, fs.nxp, d, fs.roww), np.float32)
    for a_i, j in enumerate(atom_indices):
        p, col = int(fs.planes[j]), int(fs.cols[j])
        for li, l in enumerate(orbitals):
            hi[a_i * norb + li, p, l, col] = 1.0
    return (jnp.asarray(hi), jnp.zeros_like(jnp.asarray(hi)))


def pack_flat_kernel(hs_split, st, nchunks: int = df64.DF64_CHUNKS):
    """Bucket kernel in tap-major layout + static per-tap shifts.

    Returns (wt (27, QD, QD) bf16, h_scale, dxs, colshifts).
    """
    w_conv, h_scale, radius = pack_conv_kernel_df64(
        hs_split, st.dcells, nchunks)
    if tuple(radius) != (1, 1, 1):
        raise ValueError("pallas conv engine supports radius-1 stencils")
    w = np.asarray(w_conv, np.float32)
    qd = w.shape[0]
    nzp = st.dims[2] + 2
    wt = np.zeros((27, qd, qd), np.float32)
    dxs, colshifts = [], []
    i = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                # conv convention (conv_general_dilated, padding 1):
                # y[p] = sum_k w[..., k] x[p + k - 1]  => tap (dx,dy,dz)
                # multiplies x at offset +(dx,dy,dz) when k = (dx+1,...)
                wt[i] = w[:, :, dx + 1, dy + 1, dz + 1]
                dxs.append(dx)
                colshifts.append(dy * nzp + dz)
                i += 1
    return (jnp.asarray(wt, jnp.bfloat16), float(h_scale),
            tuple(dxs), tuple(colshifts))


def _spmv_kernel(w_ref, mask_ref, x0_ref, x1_ref, x2_ref,
                 ohi_ref, olo_ref, *, nchunks: int, d: int,
                 dxs, colshifts, scale: float, roww: int):
    """One (chain, plane) cell: 27 GEMMs + df64 recombination + mask.

    The mask row arrives via its BlockSpec index map (NOT a dynamic
    in-kernel ``mask_ref[p]`` index): under ``jax_enable_x64`` the
    dynamic-offset computation emits an int64->int32 convert that sends
    Mosaic's ``_convert_helper`` into infinite recursion (jax 0.9.0
    lowering.py:2291), so all in-kernel indexing here is static."""
    width = roww - 2 * MARG
    planes = (x0_ref, x1_ref, x2_ref)
    acc = jnp.zeros((nchunks * d, width), jnp.float32)
    for t in range(len(colshifts)):
        xr = planes[dxs[t] + 1][0, 0]
        sl = xr[:, MARG + colshifts[t]:MARG + colshifts[t] + width]
        acc = acc + jax.lax.dot_general(
            w_ref[t], sl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # df64 bucket recombination (stencil_conv.conv_spmv_df64 semantics):
    # buckets 0-2 compensated, tail plain (error ~2^-45 of the head)
    tail = None
    for s in range(3, nchunks):
        part = acc[s * d:(s + 1) * d]
        tail = part if tail is None else tail + part
    hi, lo = two_sum(acc[:d], acc[d:2 * d])
    if nchunks > 2:
        s2, e2 = two_sum(hi, acc[2 * d:3 * d])
        hi, lo = s2, lo + e2
    if tail is not None:
        lo = lo + tail
    hi, lo = fast_two_sum(hi, lo)
    m = mask_ref[0, 0, MARG:MARG + width][None, :]
    sc = jnp.float32(scale)
    zero = jnp.zeros((d, MARG), jnp.float32)
    ohi_ref[0, 0] = jnp.concatenate(
        [zero, hi * sc * m, zero], axis=1)
    olo_ref[0, 0] = jnp.concatenate(
        [zero, lo * sc * m, zero], axis=1)


def conv_spmv_df64_pallas(wt, mask, psi_ds, h_scale: float, *,
                          nchunks: int, d: int, dxs, colshifts,
                          interpret: bool = False):
    """y = H psi on the flat layout via the fused Pallas SpMV.

    wt: (27, QD, QD) bf16; mask: (nxp, roww) f32 device array; psi_ds:
    df64 pair of (C, nxp, d, roww) f32.  Returns the df64 pair (exact
    zeros outside cluster cells)."""
    x = _extract_chunks_flat(psi_ds, nchunks)  # (C, nxp, QD, roww) bf16
    c, nxp, qd, roww = x.shape
    mask3 = mask[:, None, :]  # (nxp, 1, roww): per-plane mask rows

    # Index maps must stay int32-only under jax_enable_x64: weak-int
    # arithmetic promotes to int64, whose converts Mosaic cannot lower
    # (infinite _convert_helper recursion / func.return legalize errors).
    # np.int32 scalars (not jnp -- index maps must not capture tracers)
    # are strong-typed, so every op below stays i32.
    i0 = np.int32(0)

    def xmap(off):
        def f(ci, p):
            q = jnp.clip(p.astype(jnp.int32) + np.int32(off),
                         i0, np.int32(nxp - 1))
            return (ci.astype(jnp.int32), q, i0, i0)
        return f

    kern = partial(_spmv_kernel, nchunks=nchunks, d=d, dxs=dxs,
                   colshifts=colshifts, scale=h_scale * 2.0, roww=roww)
    out_shape = jax.ShapeDtypeStruct((c, nxp, d, roww), jnp.float32)
    ohi, olo = pl.pallas_call(
        kern,
        grid=(c, nxp),
        in_specs=[
            pl.BlockSpec((27, qd, qd), lambda ci, p: (i0, i0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, roww),
                         lambda ci, p: (p.astype(jnp.int32), i0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qd, roww), xmap(-1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qd, roww), xmap(0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qd, roww), xmap(1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, d, roww),
                         lambda ci, p: (ci.astype(jnp.int32),
                                        p.astype(jnp.int32), i0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, roww),
                         lambda ci, p: (ci.astype(jnp.int32),
                                        p.astype(jnp.int32), i0, i0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * nxp * 27 * qd * qd * (roww - 2 * MARG),
            bytes_accessed=3 * c * nxp * qd * roww * 2
            + 2 * c * nxp * d * roww * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wt, mask3, x, x, x)
    return ohi, olo


def _extract_chunks_flat(y, nchunks: int):
    """rint chunk extraction on the flat layout: (C, nxp, d, roww) f32
    pair -> (C, nxp, nchunks*d, roww) bf16 (chunk-major groups along
    axis 2; see stencil_conv._extract_chunks_chan)."""
    hi, lo = y
    r = hi * jnp.float32(0.5)
    w_lo = lo * jnp.float32(0.5)
    outs = []
    for k in range(nchunks):
        q = jnp.float32(2.0 ** (-df64.CHUNK_BITS * (k + 1)))
        iq = jnp.float32(2.0 ** (df64.CHUNK_BITS * (k + 1)))
        ck = jnp.rint(r * iq) * q
        outs.append(ck.astype(jnp.bfloat16))
        r = r - ck
        if k == 2:
            r, w_lo = two_sum(r, w_lo)
        elif k == 3:
            r = r + w_lo
    return jnp.concatenate(outs, axis=2)


@partial(jax.jit, static_argnames=("h_scale", "lld", "nchunks", "d",
                                   "dxs", "colshifts", "interpret"))
def _lanczos_flat_df64_jit(wt, mask, psi0_hi, psi0_lo, h_scale: float,
                           lld: int, nchunks: int, d: int, dxs,
                           colshifts, interpret: bool = False):
    """Haydock recursion on the flat layout (same math as
    stencil_conv._lanczos_conv_df64_jit)."""
    hs = h_scale

    def step(carry, _):
        psi_hi, psi_lo, pmn_hi, pmn_lo, sp_hi, sp_lo = carry
        psi = (psi_hi, psi_lo)
        v = conv_spmv_df64_pallas(wt, mask, psi, hs, nchunks=nchunks,
                                  d=d, dxs=dxs, colshifts=colshifts,
                                  interpret=interpret)
        a_ll = ds_dot_chain(v, psi)
        t = ds_mul((a_ll[0][:, None, None, None],
                    a_ll[1][:, None, None, None]), psi)
        pmn = ds_add(ds_add((pmn_hi, pmn_lo), v), (-t[0], -t[1]))
        summ = ds_dot_chain(pmn, pmn)
        s = ds_sqrt(summ)
        rinv = ds_recip(s)
        psi_new = ds_mul((rinv[0][:, None, None, None],
                          rinv[1][:, None, None, None]), pmn)
        pm = ds_mul((s[0][:, None, None, None],
                     s[1][:, None, None, None]), psi)
        carry_out = (psi_new[0], psi_new[1], -pm[0], -pm[1],
                     summ[0], summ[1])
        return carry_out, (a_ll[0], a_ll[1], sp_hi, sp_lo)

    c = psi0_hi.shape[0]
    pmn0 = jnp.zeros_like(psi0_hi)
    ones = jnp.ones((c,), jnp.float32)
    zer = jnp.zeros((c,), jnp.float32)
    carry0 = (psi0_hi, psi0_lo, pmn0, pmn0, ones, zer)
    carry, (ahi, alo, bhi, blo) = jax.lax.scan(step, carry0, None,
                                               length=lld - 1)
    return ahi, alo, bhi, blo, carry[4], carry[5]


def lanczos_coefficients_flat_df64(wt, h_scale: float, mask, psi0_ds,
                                   lld: int, *, dxs, colshifts,
                                   nchunks: int = df64.DF64_CHUNKS,
                                   d: int = 18, interpret: bool = False):
    """Haydock recursion via the Pallas SpMV.  Same contract as
    :func:`.stencil_conv.lanczos_coefficients_conv_df64`."""
    ahi, alo, bhi, blo, shi, slo = _lanczos_flat_df64_jit(
        wt, jnp.asarray(mask), psi0_ds[0], psi0_ds[1],
        float(h_scale), lld, nchunks, d, tuple(dxs),
        tuple(colshifts), interpret)
    a = np.asarray(ahi, np.float64) + np.asarray(alo, np.float64)
    b2 = np.asarray(bhi, np.float64) + np.asarray(blo, np.float64)
    last = np.asarray(shi, np.float64) + np.asarray(slo, np.float64)
    c = a.shape[1]
    a = np.concatenate([a, np.zeros((1, c))], axis=0)
    b2 = np.concatenate([b2, last[None, :]], axis=0)
    return a, b2
