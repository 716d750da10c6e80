"""Fused Pallas TPU kernel for the df64 bucket-conv SpMV.

The XLA conv lowering of :mod:`.stencil_conv` re-reads the chunked
wavefront once per tap (27x) from HBM — measured HBM-bound at ~31 ms per
step on the bench workload, with another ~10 ms for the separate bucket
recombination pass.  This kernel is the speed-of-light rewrite the
survey planned (SURVEY §7): the spatial box is flattened to padded
(plane, row) form so every stencil tap becomes a STATIC column shift,
and each grid step

  * keeps the tap-filtered bucket kernel resident in VMEM (only
    OCCUPIED stencil taps — 15 for bcc — not the dense 27),
  * processes P (=4) planes per grid cell, extracting each needed
    plane's df64 chunks once ((P+2)/P passes per plane per step),
  * runs P x ntaps MXU GEMMs  (QD, QD) @ (QD, WIDTH)  in f32,
  * recombines the df64 buckets + applies the cluster mask IN-KERNEL,
    writing only the (d, roww) hi/lo pairs — ~3.5x less output traffic
    than the bucket tensor — plus block-accumulated <v|psi> partials.

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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64
from .df64 import (
    ds_mul,
    ds_recip,
    ds_sqrt,
    fast_two_sum,
    two_prod,
    two_sum,
)
from .stencil_conv import _fold_halves, pack_conv_kernel_df64

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

    Only OCCUPIED taps are emitted — tap (dx, dy, dz) exists iff some
    canonical neighbor slot sits at that cell offset (``st.dcells``) —
    so the kernel's GEMM count is the true neighbor count (15 for bcc,
    13 for fcc) instead of the dense 27, removing the roofline's
    "tap padding" factor (BASELINE.md).  Occupancy is structural
    (geometry, not values), so the static tap tuple never changes
    between SCF iterations and cannot retrigger compilation.

    Returns (wt (ntaps, QD, QD) bf16, h_scale, dxs, colshifts).
    """
    w_conv, h_scale, radius = pack_conv_kernel_df64(
        hs_split, st.dcells, nchunks)
    if tuple(radius) != (1, 1, 1):
        raise ValueError("pallas conv engine supports radius-1 stencils")
    w = np.asarray(w_conv, np.float32)
    qd = w.shape[0]
    nzp = st.dims[2] + 2
    occupied = {tuple(int(v) for v in d) for d in st.dcells}
    wt_l, dxs, colshifts = [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) not in occupied:
                    continue
                # conv convention (conv_general_dilated, padding 1):
                # y[p] = sum_k w[..., k] x[p + k - 1]  => tap (dx,dy,dz)
                # multiplies x at offset +(dx,dy,dz) when k = (dx+1,...)
                wt_l.append(w[:, :, dx + 1, dy + 1, dz + 1])
                dxs.append(dx)
                colshifts.append(dy * nzp + dz)
    wt = np.stack(wt_l, axis=0)
    return (jnp.asarray(wt, jnp.bfloat16), float(h_scale),
            tuple(dxs), tuple(colshifts))


def _fold_rows(ph, pe, d: int):
    """Compensated column sum over the d sublane rows by halving —
    log2(d) vector steps on (rows, width) slices instead of d-1
    sequential (1, width) adds (the (1, width) form wastes 7/8 of the
    VPU sublanes)."""
    n = 1 << (d - 1).bit_length()
    if n != d:
        z = jnp.zeros((n - d,) + ph.shape[1:], ph.dtype)
        ph = jnp.concatenate([ph, z], axis=0)
        pe = jnp.concatenate([pe, z], axis=0)
    while n > 1:
        half = n // 2
        s_, e_ = two_sum(ph[:half], ph[half:n])
        ph, pe = s_, pe[:half] + (e_ + pe[half:n])
        n = half
    return fast_two_sum(ph, pe)


def _extract_block(hi, lo, nchunks: int):
    """In-kernel rint chunk extraction of one (d, roww) df64 plane into
    the (nchunks*d, roww) bf16 chunk stack (chunk-major along axis 0;
    values on the shared power-of-two grids of
    ``stencil_conv._extract_chunks_chan``)."""
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
    return jnp.concatenate(outs, axis=0)


def _spmv_kernel(w_ref, mask_ref, ph0_ref, pl0_ref, ph1_ref, pl1_ref,
                 ph2_ref, pl2_ref, ohi_ref, olo_ref, ahi_ref, alo_ref,
                 *, nchunks: int, d: int, dxs, colshifts, scale: float,
                 roww: int, pplanes: int):
    """One (chain, plane-block) cell: in-VMEM chunk extraction of the
    P + 2 df64 wavefront planes the window needs, P x ntaps MXU GEMMs,
    df64 bucket recombination + mask, and the compensated partial dot
    <v|psi> accumulated over the block's planes.

    The three psi specs arrive at BLOCK offsets (q-1, q, q+1) spanning
    3P planes; output plane j of the block (global qP + j) reads
    extracted planes j-1, j, j+1 — so each plane is extracted
    (P+2)/P ~ 1.5x per step instead of the 3x of one-plane blocks
    (extraction was ~14%% of the step at P=1).

    Reading the f32 wavefront pairs directly (instead of a pre-chunked
    bf16 tensor) keeps the whole-wavefront chunk tensor out of HBM.

    All in-kernel indexing is static: under ``jax_enable_x64`` dynamic
    index arithmetic emits int64->int32 converts that send Mosaic's
    ``_convert_helper`` into infinite recursion (jax 0.9.0
    lowering.py:2291)."""
    width = roww - 2 * MARG
    p = pplanes
    # the 3P-plane span: planes [qP-P, qP+2P); needed: [qP-1, qP+P]
    # = span-local indices P-1 .. 2P.  Extract each exactly once.
    span = (ph0_ref, pl0_ref), (ph1_ref, pl1_ref), (ph2_ref, pl2_ref)

    def span_plane(i):  # span-local plane i -> (hi, lo) 2-D views
        b, j = divmod(i, p)
        return span[b][0][0, j], span[b][1][0, j]

    ext = []
    for k in range(p + 2):
        hi_k, lo_k = span_plane(p - 1 + k)
        ext.append(_extract_block(hi_k, lo_k, nchunks))

    sc = jnp.float32(scale)
    acc_ah = acc_al = None
    for j in range(p):
        acc = jnp.zeros((nchunks * d, width), jnp.float32)
        for t in range(len(colshifts)):
            xr = ext[j + 1 + dxs[t]]
            sl = xr[:, MARG + colshifts[t]:MARG + colshifts[t] + width]
            acc = acc + jax.lax.dot_general(
                w_ref[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # df64 bucket recombination (stencil_conv.conv_spmv_df64):
        # buckets 0-2 compensated, tail plain (~2^-45 of the head)
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
        m = mask_ref[j, 0, MARG:MARG + width][None, :]
        vh = hi * sc * m
        vl = lo * sc * m
        zero = jnp.zeros((d, MARG), jnp.float32)
        ohi_ref[0, j] = jnp.concatenate([zero, vh, zero], axis=1)
        olo_ref[0, j] = jnp.concatenate([zero, vl, zero], axis=1)
        # fused partial dot <v|psi> (compensated; accumulated over the
        # block's planes so the caller folds a P-times-smaller map)
        ch = ph1_ref[0, j][:, MARG:MARG + width]
        cl = pl1_ref[0, j][:, MARG:MARG + width]
        ph, pe = two_prod(vh, ch)
        pe = pe + (vh * cl + vl * ch)
        ah, al = _fold_rows(ph, pe, d)
        if acc_ah is None:
            acc_ah, acc_al = ah, al
        else:
            s_, e_ = two_sum(acc_ah, ah)
            acc_ah, acc_al = s_, acc_al + (e_ + al)
    zero1 = jnp.zeros((1, MARG), jnp.float32)
    ahi_ref[0, 0] = jnp.concatenate([zero1, acc_ah, zero1], axis=1)
    alo_ref[0, 0] = jnp.concatenate([zero1, acc_al, zero1], axis=1)


def _pplanes_for(nxp: int) -> int:
    for p in (4, 3, 2):
        if nxp % p == 0:
            return p
    return 1


def conv_spmv_df64_pallas(wt, mask, psi_ds, h_scale: float, *,
                          nchunks: int, d: int, dxs, colshifts,
                          interpret: bool = False):
    """y = H psi on the flat layout via the fused Pallas SpMV.

    wt: (ntaps, QD, QD) bf16; mask: (nxp, roww) f32 device array;
    psi_ds: df64 pair of (C, nxp, d, roww) f32.  Returns (v_hi, v_lo,
    a_hi, a_lo): the df64 SpMV pair (exact zeros outside cluster
    cells) plus the per-column partial-dot maps of <v|psi> (shape
    (C, nxp/P, 1, roww), already summed within each plane block); sum
    the a maps over (block, column) for the chain dot."""
    psi_hi, psi_lo = psi_ds
    c, nxp, dd, roww = psi_hi.shape
    qd = nchunks * d
    ntaps = int(wt.shape[0])
    pp = _pplanes_for(nxp)
    nblk = nxp // pp
    mask3 = mask[:, None, :]  # (nxp, 1, roww): per-plane mask rows

    # Index maps must stay int32-only under jax_enable_x64: weak-int
    # arithmetic promotes to int64, whose converts Mosaic cannot lower
    # (infinite _convert_helper recursion / func.return legalize errors).
    # np.int32 scalars (not jnp -- index maps must not capture tracers)
    # are strong-typed, so every op below stays i32.
    i0 = np.int32(0)

    def xmap(off):
        def f(ci, q):
            b = jnp.clip(q.astype(jnp.int32) + np.int32(off),
                         i0, np.int32(nblk - 1))
            return (ci.astype(jnp.int32), b, i0, i0)
        return f

    kern = partial(_spmv_kernel, nchunks=nchunks, d=d, dxs=dxs,
                   colshifts=colshifts, scale=h_scale * 2.0, roww=roww,
                   pplanes=pp)
    out_shape = jax.ShapeDtypeStruct((c, nxp, d, roww), jnp.float32)
    apart_shape = jax.ShapeDtypeStruct((c, nblk, 1, roww), jnp.float32)

    def omap(ci, q):
        return (ci.astype(jnp.int32), q.astype(jnp.int32), i0, i0)

    psi_spec = lambda off: pl.BlockSpec((1, pp, d, roww), xmap(off),
                                        memory_space=pltpu.VMEM)
    ohi, olo, ahi, alo = pl.pallas_call(
        kern,
        grid=(c, nblk),
        in_specs=[
            pl.BlockSpec((ntaps, qd, qd), lambda ci, q: (i0, i0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pp, 1, roww),
                         lambda ci, q: (q.astype(jnp.int32), i0, i0),
                         memory_space=pltpu.VMEM),
            psi_spec(-1), psi_spec(-1),
            psi_spec(0), psi_spec(0),
            psi_spec(1), psi_spec(1),
        ],
        out_specs=(
            pl.BlockSpec((1, pp, d, roww), omap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pp, d, roww), omap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, roww), omap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, roww), omap, memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape, apart_shape, apart_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * nxp * ntaps * qd * qd * (roww - 2 * MARG),
            bytes_accessed=6 * c * nxp * d * roww * 4
            + 2 * c * nxp * d * roww * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wt, mask3, psi_hi, psi_lo, psi_hi, psi_lo, psi_hi, psi_lo)
    return ohi, olo, ahi, alo


def _spmv_kernel_roll(w_ref, mask_ref, psih_hbm, psil_hbm,
                      ohi_ref, olo_ref, ahi_ref, alo_ref,
                      inbuf, chunks, dsem, *, nchunks: int, d: int,
                      dxs, colshifts, scale: float, roww: int,
                      nxp: int):
    """Rolling-window SpMV for ONE chain: the x planes stream from HBM
    via double-buffered DMA and each plane's df64 chunk extraction
    happens exactly ONCE (the blocked-window kernel re-extracted every
    plane 3x — the dx = -1..1 windows — which was ~14%% of the step).

    Per plane p (1..nxp-2): wait plane p+1's DMA, extract it into the
    3-slot rolling chunk buffer, run the tap GEMMs for output plane p
    from chunk slots (p-1, p, p+1) mod 3, recombine df64 buckets +
    mask, store the output plane, and accumulate the compensated
    partial dot <v|psi> against the plane-p pair still in the input
    buffer.  Shell planes (0, nxp-1) are exact zeros.

    All dynamic indices live on UNTILED leading dims (slot/plane), and
    every index value derives from i32 loop counters — the Mosaic
    int64 lowering trap (module docstring) never appears."""
    width = roww - 2 * MARG
    ci = pl.program_id(0)
    qd = nchunks * d

    i32 = jnp.int32

    def dma(slot, p):
        # EVERY ref index must be i32: under jax_enable_x64 a Python
        # literal index lowers to i64, which tpu.memref_slice rejects
        slot = i32(slot)
        p = i32(p)
        return (pltpu.make_async_copy(psih_hbm.at[ci, p],
                                      inbuf.at[slot, i32(0)],
                                      dsem.at[slot, i32(0)]),
                pltpu.make_async_copy(psil_hbm.at[ci, p],
                                      inbuf.at[slot, i32(1)],
                                      dsem.at[slot, i32(1)]))

    def wait(slot, p):
        for t in dma(slot, p):
            t.wait()

    def start(slot, p):
        for t in dma(slot, p):
            t.start()

    def extract_to(slot_c, slot_in):
        slot_c = i32(slot_c)
        slot_in = i32(slot_in)
        chunks[slot_c] = _extract_block(inbuf[slot_in, i32(0)],
                                        inbuf[slot_in, i32(1)], nchunks)

    # prologue: planes 0 and 1 in, extracted; plane 2 in flight
    start(0, np.int32(0))
    start(1, np.int32(1))
    wait(0, np.int32(0))
    extract_to(np.int32(0), np.int32(0))
    wait(1, np.int32(1))
    extract_to(np.int32(1), np.int32(1))
    zero_d = jnp.zeros((d, roww), jnp.float32)
    ohi_ref[0, 0] = zero_d
    olo_ref[0, 0] = zero_d
    ohi_ref[0, nxp - 1] = zero_d
    olo_ref[0, nxp - 1] = zero_d
    if nxp > 3:
        start(np.int32(0), np.int32(2))

    sc = jnp.float32(scale)

    def body(p, acc):
        acc_h, acc_l = acc
        pn = p + 1  # plane p+1 arrives into slot pn % 2
        sl_in = lax.rem(pn, 2)

        @pl.when(pn < nxp - 1)
        def _():
            wait(sl_in, pn)
            extract_to(lax.rem(pn, 3), sl_in)

        @pl.when(pn >= nxp - 1)
        def _():
            # plane nxp-1 is the zero shell: zero chunks, no DMA
            chunks[lax.rem(pn, 3)] = jnp.zeros((qd, roww), jnp.bfloat16)

        accm = jnp.zeros((nchunks * d, width), jnp.float32)
        for t in range(len(colshifts)):
            s_t = lax.rem(p + dxs[t] + 3, 3)
            xr = chunks[s_t]
            sl = xr[:, MARG + colshifts[t]:MARG + colshifts[t] + width]
            accm = accm + jax.lax.dot_general(
                w_ref[t], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        tail = None
        for s in range(3, nchunks):
            part = accm[s * d:(s + 1) * d]
            tail = part if tail is None else tail + part
        hi, lo = two_sum(accm[:d], accm[d:2 * d])
        if nchunks > 2:
            s2, e2 = two_sum(hi, accm[2 * d:3 * d])
            hi, lo = s2, lo + e2
        if tail is not None:
            lo = lo + tail
        hi, lo = fast_two_sum(hi, lo)
        m = mask_ref[p, i32(0)][None, MARG:MARG + width]  # (1, width)
        vh = hi * sc * m
        vl = lo * sc * m
        zero = jnp.zeros((d, MARG), jnp.float32)
        ohi_ref[i32(0), p] = jnp.concatenate([zero, vh, zero], axis=1)
        olo_ref[i32(0), p] = jnp.concatenate([zero, vl, zero], axis=1)
        # compensated partial dot <v|psi> with the plane-p pair (still
        # resident in the input buffer slot p % 2)
        sl_p = lax.rem(p, 2)
        ch = inbuf[sl_p, i32(0)][:, MARG:MARG + width]
        cl = inbuf[sl_p, i32(1)][:, MARG:MARG + width]
        ph, pe = two_prod(vh, ch)
        pe = pe + (vh * cl + vl * ch)
        ah, al = _fold_rows(ph, pe, d)
        s_, e_ = two_sum(acc_h, ah)
        acc_h, acc_l = s_, acc_l + (e_ + al)

        @pl.when(p + 2 < nxp - 1)
        def _():
            # plane p's pair slot is free now (dot done): reuse it
            start(sl_p, p + 2)

        return (acc_h, acc_l)

    acc0 = (jnp.zeros((1, width), jnp.float32),
            jnp.zeros((1, width), jnp.float32))
    # i32 loop bounds: python-int bounds make an i64 counter under
    # jax_enable_x64, which Mosaic's convert lowering cannot handle
    acc_h, acc_l = lax.fori_loop(np.int32(1), np.int32(nxp - 1),
                                 body, acc0)
    zero1 = jnp.zeros((1, MARG), jnp.float32)
    ahi_ref[0] = jnp.concatenate([zero1, acc_h, zero1], axis=1)
    alo_ref[0] = jnp.concatenate([zero1, acc_l, zero1], axis=1)


def conv_spmv_df64_pallas_roll(wt, mask, psi_ds, h_scale: float, *,
                               nchunks: int, d: int, dxs, colshifts,
                               interpret: bool = False):
    """Rolling-window variant of :func:`conv_spmv_df64_pallas`: one
    grid cell per chain, psi streamed plane-by-plane via manual DMA.
    Returns (v_hi, v_lo, a_hi, a_lo) with the dot partials ALREADY
    summed over planes — a pair of (C, 1, roww)."""
    psi_hi, psi_lo = psi_ds
    c, nxp, dd, roww = psi_hi.shape
    qd = nchunks * d
    ntaps = int(wt.shape[0])
    mask3 = mask[:, None, :]  # (nxp, 1, roww)
    i0 = np.int32(0)

    kern = partial(_spmv_kernel_roll, nchunks=nchunks, d=d, dxs=dxs,
                   colshifts=colshifts, scale=h_scale * 2.0, roww=roww,
                   nxp=nxp)
    out_shape = jax.ShapeDtypeStruct((c, nxp, d, roww), jnp.float32)
    apart_shape = jax.ShapeDtypeStruct((c, 1, roww), jnp.float32)

    def omap(ci):
        return (ci.astype(jnp.int32), i0, i0, i0)

    def amap(ci):
        return (ci.astype(jnp.int32), i0, i0)

    ohi, olo, ahi, alo = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((ntaps, qd, qd), lambda ci: (i0, i0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nxp, 1, roww), lambda ci: (i0, i0, i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, nxp, d, roww), omap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nxp, d, roww), omap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, roww), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, roww), amap, memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape, apart_shape, apart_shape),
        scratch_shapes=[
            pltpu.VMEM((2, 2, d, roww), jnp.float32),   # plane pairs
            pltpu.VMEM((3, qd, roww), jnp.bfloat16),    # chunk window
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * c * nxp * ntaps * qd * qd * (roww - 2 * MARG),
            bytes_accessed=4 * c * nxp * d * roww * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wt, mask3, psi_hi, psi_lo)
    return ohi, olo, ahi, alo


def _update_kernel(ah_ref, al_ref, psih_ref, psil_ref, vh_ref, vl_ref,
                   pmnh_ref, pmnl_ref, oh_ref, ol_ref, nh_ref, nl_ref,
                   *, d: int, pplanes: int):
    """Fused Lanczos update for one (chain, plane-block) cell:

        pmn' = pmn + v - a * psi          (df64 elementwise)
        nrm  = column partials of <pmn'|pmn'>   (compensated)

    Replaces three full-wavefront XLA passes (the a*psi axpy, the
    double ds_add, and the norm dot's re-read) with one HBM pass.
    Margins and shell planes stay exactly zero (all inputs are zero
    there), so no mask is needed.  a arrives per chain as an SMEM
    scalar pair.  Blocks carry ``pplanes`` planes each (fewer, larger
    grid cells amortise the per-cell pipeline overhead)."""
    ci = pl.program_id(0)  # i32 scalar SMEM load — no i64 involved
    # broadcast to (1, 1, 1) vectors: two_prod's bit-split uses
    # tpu.bitcast, which Mosaic only lowers for vector operands
    ah = jnp.full((1, 1, 1), ah_ref[ci], jnp.float32)
    al = jnp.full((1, 1, 1), al_ref[ci], jnp.float32)
    psih = psih_ref[0]  # (pplanes, d, roww)
    psil = psil_ref[0]
    th, te = two_prod(ah, psih)
    te = te + (ah * psil + al * psih)
    s1h, s1l = two_sum(pmnh_ref[0], vh_ref[0])
    s1l = s1l + (pmnl_ref[0] + vl_ref[0])
    s1h, s1l = fast_two_sum(s1h, s1l)
    nh, nl = two_sum(s1h, -th)
    nl = nl + (s1l - te)
    nh, nl = fast_two_sum(nh, nl)
    oh_ref[0] = nh
    ol_ref[0] = nl
    ph, pe = two_prod(nh, nh)
    pe = pe + 2.0 * nh * nl
    # compensated column sum over the d rows by halving (axis 1)
    n = 1 << (d - 1).bit_length()
    if n != d:
        z = jnp.zeros((pplanes, n - d, ph.shape[-1]), ph.dtype)
        ph = jnp.concatenate([ph, z], axis=1)
        pe = jnp.concatenate([pe, z], axis=1)
    while n > 1:
        half = n // 2
        s_, e_ = two_sum(ph[:, :half], ph[:, half:n])
        ph, pe = s_, pe[:, :half] + (e_ + pe[:, half:n])
        n = half
    rh, rl = fast_two_sum(ph, pe)
    nh_ref[0] = rh
    nl_ref[0] = rl


def lanczos_update_pallas(a_ds, psi_ds, v_ds, pmn_ds, *, d: int,
                          interpret: bool = False):
    """pmn' = pmn + v - a*psi plus the norm partial maps, fused.

    a_ds: df64 pair of (C,) chain scalars; the array pairs are
    (C, nxp, d, roww).  Returns (pmn'_hi, pmn'_lo, nrm_hi, nrm_lo) with
    nrm maps (C, nxp, 1, roww) to be folded by the caller."""
    psi_hi, psi_lo = psi_ds
    c, nxp, dd, roww = psi_hi.shape
    pplanes = 4 if nxp % 4 == 0 else (2 if nxp % 2 == 0 else 1)
    i0 = np.int32(0)
    a2h = a_ds[0].reshape(c)
    a2l = a_ds[1].reshape(c)

    def amap(ci, p):
        return (i0,)

    def omap(ci, p):
        return (ci.astype(jnp.int32), p.astype(jnp.int32), i0, i0)

    blk = pl.BlockSpec((1, pplanes, d, roww), omap,
                       memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((c,), amap, memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((c, nxp, d, roww), jnp.float32)
    nrm_shape = jax.ShapeDtypeStruct((c, nxp, 1, roww), jnp.float32)
    kern = partial(_update_kernel, d=d, pplanes=pplanes)
    oh, ol, nh, nl = pl.pallas_call(
        kern,
        grid=(c, nxp // pplanes),
        in_specs=[sblk, sblk, blk, blk, blk, blk, blk, blk],
        out_specs=(
            blk, blk,
            pl.BlockSpec((1, pplanes, 1, roww), omap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pplanes, 1, roww), omap,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape, nrm_shape, nrm_shape),
        cost_estimate=pl.CostEstimate(
            flops=30 * c * nxp * d * roww,
            bytes_accessed=8 * c * nxp * d * roww * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a2h, a2l, psi_hi, psi_lo, v_ds[0], v_ds[1], pmn_ds[0], pmn_ds[1])
    return oh, ol, nh, nl


@partial(jax.jit, static_argnames=("h_scale", "lld", "nchunks", "d",
                                   "dxs", "colshifts", "interpret",
                                   "roll"))
def _lanczos_flat_df64_jit(wt, mask, psi0_hi, psi0_lo, h_scale: float,
                           lld: int, nchunks: int, d: int, dxs,
                           colshifts, interpret: bool = False,
                           roll: bool = False):
    """Haydock recursion on the flat layout (same math as
    stencil_conv._lanczos_conv_df64_jit).  ``roll=True`` streams psi
    through the rolling-window DMA kernel (one extraction per plane);
    ``roll=False`` keeps the blocked-window kernel."""
    hs = h_scale

    def step(carry, _):
        psi_hi, psi_lo, pmn_hi, pmn_lo, sp_hi, sp_lo = carry
        psi = (psi_hi, psi_lo)
        if roll:
            vh, vl, aph, apl = conv_spmv_df64_pallas_roll(
                wt, mask, psi, hs, nchunks=nchunks, d=d, dxs=dxs,
                colshifts=colshifts, interpret=interpret)
            ah, al = aph[:, 0, :], apl[:, 0, :]  # plane-summed already
        else:
            vh, vl, aph, apl = conv_spmv_df64_pallas(
                wt, mask, psi, hs, nchunks=nchunks, d=d, dxs=dxs,
                colshifts=colshifts, interpret=interpret)
            ah, al = aph[:, :, 0, :], apl[:, :, 0, :]
        v = (vh, vl)
        # fold the kernel's per-column partial-dot maps: the <v|psi>
        # dot without re-reading v from HBM
        while ah.ndim > 1:
            ah, al = _fold_halves(ah, al)
        a_ll = (ah, al)
        # fused update kernel: pmn' = pmn + v - a*psi and the norm
        # partial maps in ONE pass (vs 3 XLA passes + a dot re-read)
        ph_, pl_, nh_, nl_ = lanczos_update_pallas(
            a_ll, psi, v, (pmn_hi, pmn_lo), d=d, interpret=interpret)
        pmn = (ph_, pl_)
        sh, sl = nh_[:, :, 0, :], nl_[:, :, 0, :]
        while sh.ndim > 1:
            sh, sl = _fold_halves(sh, sl)
        summ = (sh, sl)
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
                                   d: int = 18, interpret: bool = False,
                                   roll: bool = None):
    """Haydock recursion via the Pallas SpMV.  Same contract as
    :func:`.stencil_conv.lanczos_coefficients_conv_df64`."""
    import os as _os

    if roll is None:
        # the rolling-DMA kernel is opt-in: the axon backend's chipless
        # remote-compile helper cannot compile ANY kernel that
        # allocates DMA semaphores (HTTP 500 in tpu_compile_helper even
        # for a minimal copy kernel, verified r5); interpret-mode
        # parity is tested so the engine is ready when the toolchain is
        roll = bool(_os.environ.get("RSLMTO_ROLL"))
    nxp = int(psi0_ds[0].shape[1])
    roll = bool(roll) and nxp >= 3
    ahi, alo, bhi, blo, shi, slo = _lanczos_flat_df64_jit(
        wt, jnp.asarray(mask), psi0_ds[0], psi0_ds[1],
        float(h_scale), lld, nchunks, d, tuple(dxs),
        tuple(colshifts), interpret, roll)
    a = np.asarray(ahi, np.float64) + np.asarray(alo, np.float64)
    b2 = np.asarray(bhi, np.float64) + np.asarray(blo, np.float64)
    last = np.asarray(shi, np.float64) + np.asarray(slo, np.float64)
    c = a.shape[1]
    a = np.concatenate([a, np.zeros((1, c))], axis=0)
    b2 = np.concatenate([b2, last[None, :]], axis=0)
    return a, b2
