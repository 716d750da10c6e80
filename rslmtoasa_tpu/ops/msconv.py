"""Multi-site df64 bucket-conv engines for block-Lanczos and Chebyshev.

This is the TPU production path for the recursion engines every reference
SCF case actually uses (``recur='block'|'chebyshev'``, all 18 cases in
``/root/reference/tests/scf/cases.json``): the masked block SpMV of
``recursion.f90`` ``hop_b`` :1560, ``hop_b_hoh`` :1411 and
``chebyshev_recur_ll`` :2495 re-expressed as a 3-D bucket convolution.

Extends the single-site scalar design of :mod:`.stencil_conv` in three
ways:

* **multi-site cells** — the basis index folds into the conv channel
  axis (as planned at ``stencil_conv.py:31-32``): channels are
  ``(chunk, basis, row)`` and each output basis has its own tap set, so
  B2/Heusler/fcc cells with inequivalent sites run on the same conv;
* **18x18 spinor blocks, df64-pair state** — the engine state is the
  realified (36x36-real) block wavefront as a PAIR of f32 arrays; the
  SpMV runs in exact df64 bucket convolutions (MXU bf16), and the block
  algebra that scales with the grid — Gram blocks
  (:func:`gram_chunks`, segmented bucket matmuls) and column transforms
  (:func:`colmul_chunks`) — is built from the same exact chunk products
  with compensated accumulation.  Nothing large ever touches
  XLA-emulated f64 (measured ~40x slower than f32 on the axon backend);
  only the per-step 36x36 eigensolve stays emulated (grid-independent
  cost);
* **grouped exact accumulation** — one fused bucket conv is only exact
  while (taps x in-channels) x 2^12 fits in the f32 integer window
  (2^24).  Multi-site channel counts exceed it, so the input channels
  are split into groups at pack time and the group partials are
  compensated-summed (two_sum cascade) — error-free for any cell size.

Accuracy: the SpMV is ~1e-13 relative (exact bucket sums + compensated
recombination); whole-recursion parity vs the complex128 engines is
tested at 1e-10 (``tests/test_msconv.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import df64
from .df64 import fast_two_sum, two_sum
from .stencil_conv import _extract_chunks_chan


@dataclass
class MSStencil:
    """Multi-site box embedding: atoms live at (basis, cell) grid sites."""

    dims: Tuple[int, int, int]  # (nx, ny, nz) cell-grid shape
    ntot: int  # basis sites per cell
    cells: np.ndarray  # (kk, 3) 0-based cell coords per atom
    basis: np.ndarray  # (kk,) 0-based basis index per atom
    basis_type: np.ndarray  # (ntot,) 0-based Hamiltonian row (type) per basis
    dcells: np.ndarray  # (ntot, nslots, 3) per-basis per-slot cell offsets
    nbasis: np.ndarray  # (ntot, nslots) neighbor basis per slot
    slot_ok: np.ndarray  # (ntot, nslots) slot exists for this basis
    mask: np.ndarray  # (ntot, nx, ny, nz) f32 occupancy
    kk: int


def build_ms_stencil(cl) -> MSStencil:
    """Multi-site cell-grid embedding of a crystal cluster.

    Raises ValueError for clusters without a constant-offset stencil
    (impurity ``hall`` zones, wrapped PBC, surface layers with per-layer
    types) — callers fall back to the gather engine.
    """
    if cl.nn is None or cl.dirs is None:
        raise ValueError("cluster has no neighbor map")
    if getattr(cl, "nmax", 0):
        raise ValueError("impurity-local zone breaks translation invariance")
    if any(getattr(cl, "pbc_wrap", (False,) * 3)):
        raise ValueError("wrapped PBC aliases conv taps")
    nb = cl.cell.ntot
    a = cl.cell.a * cl.alat
    ainv = np.linalg.inv(a)
    basis = (np.asarray(cl.num) - 1).astype(np.int64)
    if basis.min() < 0 or basis.max() >= nb:
        raise ValueError("basis bookkeeping out of range")
    rel = cl.cr_ang - (cl.cell.crd[:, basis] * cl.alat).T
    m = (ainv @ rel.T).T
    cells = np.round(m).astype(np.int64)
    if not np.allclose(m, cells, atol=1e-6):
        raise ValueError("atom not on the lattice grid")
    lo = cells.min(axis=0)
    cells = cells - lo
    dims = tuple(int(d) for d in cells.max(axis=0) + 1)

    nslots = cl.nn.shape[1] + 1
    dcells = np.zeros((nb, nslots, 3), np.int64)
    nbas = np.zeros((nb, nslots), np.int64)
    slot_ok = np.zeros((nb, nslots), bool)
    slot_ok[:, 0] = True
    nbas[:, 0] = np.arange(nb)
    # surface/multi-type-per-basis guard: all atoms of a basis must share
    # one Hamiltonian row type
    basis_type = np.full(nb, -1, np.int64)
    iz0 = (np.asarray(cl.iz) - 1).astype(np.int64)
    for b in range(nb):
        sel = basis == b
        if not sel.any():
            raise ValueError(f"basis {b} has no atoms")
        tt = np.unique(iz0[sel])
        if tt.size != 1:
            raise ValueError("basis maps to multiple types (layered cell)")
        basis_type[b] = tt[0]
        # representative: an atom of this basis with the full slot set
        cand = np.nonzero(sel & (cl.nn >= 0).all(axis=1))[0]
        la = int(cand[0]) if cand.size else int(np.nonzero(sel)[0][0])
        for s in range(1, nslots):
            j = int(cl.nn[la, s - 1])
            if j < 0:
                continue
            dcells[b, s] = cells[j] - cells[la]
            nbas[b, s] = basis[j]
            slot_ok[b, s] = True
    # every slot of every basis must be represented (otherwise an interior
    # atom's hop would be silently dropped)
    for b in range(nb):
        sel = np.nonzero(basis == b)[0]
        for s in range(1, nslots):
            has = sel[cl.nn[sel, s - 1] >= 0]
            if has.size == 0:
                continue
            if not slot_ok[b, s]:
                raise ValueError(f"slot {s} of basis {b} unrepresented")
            jj = cl.nn[has, s - 1]
            ok = (cells[jj] == cells[has] + dcells[b, s][None]).all() \
                and (basis[jj] == nbas[b, s]).all()
            if not ok:
                raise ValueError(f"slot {s} of basis {b} is not constant")

    mask = np.zeros((nb,) + dims, np.float32)
    mask[basis, cells[:, 0], cells[:, 1], cells[:, 2]] = 1.0
    return MSStencil(dims=dims, ntot=nb, cells=cells, basis=basis,
                     basis_type=basis_type, dcells=dcells, nbasis=nbas,
                     slot_ok=slot_ok, mask=mask, kk=cl.kk)


# ----------------------------------------------------------------------
# kernel packing


def pack_ms_kernel_df64(hs: np.ndarray, st: MSStencil,
                        nchunks: int = df64.DF64_CHUNKS):
    """Bucket-conv kernel from realified per-type slot blocks.

    hs: (ntype, nslots, D, D) f64 REAL (realified) slot blocks, slot 0 =
    onsite.  Returns (W bf16 (7*ntot*D, 7*ntot*D, KD, KH, KW), scale,
    radius, groups) where ``groups`` are input-channel split points that
    keep every partial conv's accumulation exact (see module docstring).
    """
    hs = np.asarray(hs, np.float64)
    ntype, nslots, d = hs.shape[0], hs.shape[1], hs.shape[2]
    nb = st.ntot
    r = np.abs(st.dcells.reshape(-1, 3)).max(axis=0)
    kd, kh, kw = (int(2 * x + 1) for x in r)

    amax = float(np.max(np.abs(hs))) if hs.size else 1.0
    scale = df64._pow2ceil(amax) * 2.0
    y = hs / scale
    chunks = []
    res = y.copy()
    for k in range(nchunks):
        u = 2.0 ** (-df64.CHUNK_BITS * (k + 1))
        c = np.round(res / u) * u
        chunks.append(c)
        res = res - c
    ch = np.stack(chunks, 0)  # (nchunks, ntype, nslots, D, D)

    nd = nb * d
    w = np.zeros((nchunks * nd, nchunks * nd, kd, kh, kw), np.float32)
    for b_out in range(nb):
        t = int(st.basis_type[b_out])
        for m in range(nslots):
            if not st.slot_ok[b_out, m]:
                continue
            b_in = int(st.nbasis[b_out, m])
            tx, ty, tz = (int(v) for v in st.dcells[b_out, m] + r)
            for s in range(nchunks):
                for q in range(nchunks):
                    p = s - q
                    if p < 0 or p >= nchunks:
                        continue
                    w[s * nd + b_out * d:s * nd + (b_out + 1) * d,
                      q * nd + b_in * d:q * nd + (b_in + 1) * d,
                      tx, ty, tz] += ch[p, t, m]

    # exactness grouping: products are <= 2^12 quanta, f32 integer window
    # is 2^24 -> each partial conv may contract at most 4096 nonzero
    # kernel terms per output element.  Count per (out_ch, in D-block),
    # split greedily on D-block boundaries.
    nzb = (np.abs(w) > 0).sum(axis=(2, 3, 4))  # (out_ch, in_ch) tap counts
    nblk = nchunks * nb
    blk_terms = nzb.reshape(nchunks * nd, nblk, d).sum(axis=2)
    LIMIT = 4000
    groups = []
    start = 0
    acc = np.zeros(nchunks * nd, np.int64)
    for bi in range(nblk):
        t = blk_terms[:, bi]
        if (acc + t).max() > LIMIT and bi > start:
            groups.append((start * d, bi * d))
            start = bi
            acc = t.copy()
        else:
            acc += t
    groups.append((start * d, nblk * d))
    return (jnp.asarray(w, jnp.bfloat16), scale,
            tuple(int(x) for x in r), tuple(groups))


def pack_ms_onsite_df64(mat: np.ndarray, st: MSStencil,
                        nchunks: int = df64.DF64_CHUNKS):
    """1x1x1 bucket kernel for a per-type onsite block operator
    (the HoH enim + lsham correction applied per basis).  mat:
    (ntype, D, D) realified f64.  Returns (W bf16, scale)."""
    mat = np.asarray(mat, np.float64)
    d = mat.shape[-1]
    nb = st.ntot
    amax = float(np.max(np.abs(mat))) if mat.size else 1.0
    scale = df64._pow2ceil(max(amax, 1e-300)) * 2.0
    y = mat / scale
    chunks = []
    res = y.copy()
    for k in range(nchunks):
        u = 2.0 ** (-df64.CHUNK_BITS * (k + 1))
        c = np.round(res / u) * u
        chunks.append(c)
        res = res - c
    ch = np.stack(chunks, 0)
    nd = nb * d
    w = np.zeros((nchunks * nd, nchunks * nd, 1, 1, 1), np.float32)
    for b_out in range(nb):
        t = int(st.basis_type[b_out])
        for s in range(nchunks):
            for q in range(nchunks):
                p = s - q
                if p < 0 or p >= nchunks:
                    continue
                w[s * nd + b_out * d:s * nd + (b_out + 1) * d,
                  q * nd + b_out * d:q * nd + (b_out + 1) * d,
                  0, 0, 0] += ch[p, t]
    return jnp.asarray(w, jnp.bfloat16), scale


def mask_channels(st: MSStencil, d: int) -> np.ndarray:
    """Per-channel occupancy mask (ntot*D, nx, ny, nz)."""
    return np.repeat(st.mask, d, axis=0)


def ms_spmv_df64(w, scale, mask_chan, psi_ds, radius, groups,
                 nchunks: int = df64.DF64_CHUNKS):
    """One multi-site df64 SpMV: y = H psi via grouped bucket convs.

    psi_ds: (hi, lo) of (C, ntot*D, nx, ny, nz) f32; w as packed above;
    mask_chan (ntot*D, nx, ny, nz).  Returns a df64 pair.
    """
    x = _extract_chunks_chan(psi_ds, nchunks)
    pad = [(int(r), int(r)) for r in radius]
    acc_hi = None
    acc_lo = None
    for (c0, c1) in groups:
        o = lax.conv_general_dilated(
            x[:, c0:c1], w[:, c0:c1], window_strides=(1, 1, 1),
            padding=pad, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )
        if acc_hi is None:
            acc_hi, acc_lo = o, jnp.zeros_like(o)
        else:
            acc_hi, e = two_sum(acc_hi, o)
            acc_lo = acc_lo + e
    nd = psi_ds[0].shape[1]
    # bucket recombination with per-bucket (hi, lo) pairs; tail buckets
    # (s >= 3, <= 2^-21 of the head) sum in plain f32
    tail = None
    for s in range(3, nchunks):
        part = acc_hi[:, s * nd:(s + 1) * nd] \
            + acc_lo[:, s * nd:(s + 1) * nd]
        tail = part if tail is None else tail + part
    hi, lo = two_sum(acc_hi[:, :nd], acc_hi[:, nd:2 * nd])
    lo = lo + (acc_lo[:, :nd] + acc_lo[:, nd:2 * nd])
    if nchunks > 2:
        s2, e2 = two_sum(hi, acc_hi[:, 2 * nd:3 * nd])
        hi, lo = s2, lo + e2 + acc_lo[:, 2 * nd:3 * nd]
    if tail is not None:
        lo = lo + tail
    hi, lo = fast_two_sum(hi, lo)
    # undo extract's 1/2 pre-scale; scale is a power of two, so the f32
    # multiply is exact
    sc = jnp.asarray(scale, jnp.float32) * 2.0
    m = mask_chan[None]
    return (hi * sc * m, lo * sc * m)


# ----------------------------------------------------------------------
# df64 pair-state primitives (all heavy math f32/bf16 on the MXU)
#
# The engine state is a df64 PAIR of f32 arrays, never emulated f64:
# XLA-emulated f64 elementwise/contraction ops on the axon TPU backend
# measured ~40x slower than f32 at production sizes, so every large-
# array operation here is built from exact bf16 chunk products with
# compensated f32 accumulation (the same bucket algebra as the conv).


def _pow2_bound(hi):
    """Smallest power of two >= max|hi| (device scalar, exact)."""
    m = jnp.max(jnp.abs(hi))
    m = jnp.maximum(m, jnp.float32(1e-20))
    _, e = jnp.frexp(m)
    return jnp.exp2(e.astype(jnp.float32))


def extract_scaled(x_ds, nchunks: int = df64.DF64_CHUNKS):
    """Chunk-extract a df64 pair under a dynamic power-of-two pre-scale.

    Returns (chunks, factor): chunks bf16 (C, nchunks*nd, *grid) with
    x = factor * sum_k chunks_k to ~2^-49 relative; factor a power of
    two, so every scale propagation below is exact.  The dynamic scale
    keeps the leading chunk inside 6 bits for ANY operand magnitude
    (the recursion's pre-normalisation residuals exceed 1), preserving
    the exact-accumulation window.
    """
    s = _pow2_bound(x_ds[0])
    inv = 1.0 / s
    xs = (x_ds[0] * inv, x_ds[1] * inv)
    return _extract_chunks_chan(xs, nchunks), 2.0 * s


def conv_chunks(w, xq, fx, scale_w, mask_chan, radius, groups,
                nchunks: int = df64.DF64_CHUNKS):
    """Bucket-conv SpMV from pre-extracted chunks -> df64 pair.

    xq: bf16 (C, nchunks*nd, *grid) chunks with factor fx; w/scale_w as
    packed.  Identical math to :func:`ms_spmv_df64` with the extraction
    hoisted out so one extraction feeds conv + Gram + column ops.
    """
    pad = [(int(r), int(r)) for r in radius]
    acc_hi = None
    acc_lo = None
    for (c0, c1) in groups:
        o = lax.conv_general_dilated(
            xq[:, c0:c1], w[:, c0:c1], window_strides=(1, 1, 1),
            padding=pad, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32,
        )
        if acc_hi is None:
            acc_hi, acc_lo = o, jnp.zeros_like(o)
        else:
            acc_hi, e = two_sum(acc_hi, o)
            acc_lo = acc_lo + e
    nd = acc_hi.shape[1] // nchunks
    tail = None
    for t in range(3, nchunks):
        part = acc_hi[:, t * nd:(t + 1) * nd] \
            + acc_lo[:, t * nd:(t + 1) * nd]
        tail = part if tail is None else tail + part
    hi, lo = two_sum(acc_hi[:, :nd], acc_hi[:, nd:2 * nd])
    lo = lo + (acc_lo[:, :nd] + acc_lo[:, nd:2 * nd])
    if nchunks > 2:
        s2, e2 = two_sum(hi, acc_hi[:, 2 * nd:3 * nd])
        hi, lo = s2, lo + e2 + acc_lo[:, 2 * nd:3 * nd]
    if tail is not None:
        lo = lo + tail
    hi, lo = fast_two_sum(hi, lo)
    sc = jnp.asarray(scale_w, jnp.float32) * fx
    m = mask_chan[None]
    return (hi * sc * m, lo * sc * m)


def _fold_first(hi, lo):
    """Compensated reduction of the LEADING axis by repeated halving
    (sibling of stencil_conv._fold_halves; leading-axis slices are
    contiguous blocks, no relayout)."""
    n = hi.shape[0]
    n2 = 1 << max(0, (n - 1).bit_length())
    if n2 != n:
        padw = [(0, n2 - n)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, padw)
        lo = jnp.pad(lo, padw)
        n = n2
    while n > 1:
        half = n // 2
        s, e = two_sum(hi[:half], hi[half:n])
        e = e + (lo[:half] + lo[half:n])
        hi, lo = fast_two_sum(s, e)
        n = half
    return hi[0], lo[0]


def _combine_buckets(parts):
    """Combine per-bucket (hi, lo) pairs [b = 0..6] into one df64 pair:
    compensated adds for the head buckets, plain f32 for the tail
    (<= 2^-21 of the head) — the conv recombination pattern."""
    h, l = parts[0]
    hi, e = two_sum(h, parts[1][0])
    lo = l + e + parts[1][1]
    hi2, e2 = two_sum(hi, parts[2][0])
    hi, lo = hi2, lo + e2 + parts[2][1]
    for b in range(3, len(parts)):
        lo = lo + parts[b][0] + parts[b][1]
    return fast_two_sum(hi, lo)


def gram_chunks(xq, fx, yq, fy, r: int, d: int, nd: int,
                nchunks: int = df64.DF64_CHUNKS):
    """df64 block Gram from chunked operands.

    G[r, a, c] = sum_{Q, cell} x[(r, a), Q, cell] y[(r, c), Q, cell]
    with x = fx * sum(xq) etc.  All products are exact bf16 pairs on the
    MXU; the cell axis is segmented so every partial accumulation stays
    inside the f32 integer window (terms <= 2^24 quanta), and segments /
    chunk-pairs reduce with compensated folds — error-free for any grid.
    Returns a df64 pair of (r, d, d).
    """
    ncell = int(np.prod(xq.shape[2:]))
    # exactness: (nd * L) products of <= 2^12 quanta must stay <= 2^24
    lseg = max(1, 4096 // nd)
    nseg = -(-ncell // lseg)
    pad = nseg * lseg - ncell

    def _shape(q):
        z = q.reshape(r, d, nchunks, nd, ncell)
        if pad:
            z = jnp.pad(z, [(0, 0)] * 4 + [(0, pad)])
        return z.reshape(r, d, nchunks, nd, nseg, lseg)

    x = _shape(xq)
    y = _shape(yq)
    # all chunk-pair partials in one contraction: (p, q, r, seg, a, c)
    partial = jnp.einsum("rapdsl,rcqdsl->pqrsac", x, y,
                         preferred_element_type=jnp.float32)
    parts = []
    for b in range(nchunks):
        sel = [partial[pp, b - pp] for pp in range(nchunks)
               if 0 <= b - pp < nchunks]
        stack = jnp.concatenate(sel, axis=1)  # (r, n_sel*seg, a, c)
        stack = jnp.moveaxis(stack, 1, 0).reshape(-1, r, d, d)
        parts.append(_fold_first(stack, jnp.zeros_like(stack)))
    hi, lo = _combine_buckets(parts)
    sc = fx * fy
    return (hi * sc, lo * sc)


def extract_small(m_ds, nchunks: int = df64.DF64_CHUNKS):
    """Chunk-extract a small df64 block pair (r, d, d) -> (chunks bf16
    (r, nchunks, d, d), factor)."""
    s = _pow2_bound(m_ds[0])
    inv = 1.0 / s
    ms = (m_ds[0] * inv, m_ds[1] * inv)
    q = _extract_chunks_chan(ms, nchunks)  # (r, nchunks*d, d)
    r, _, d = q.shape
    return q.reshape(r, nchunks, d, d), 2.0 * s


def colmul_chunks(xq, fx, mq, fm, r: int, d: int,
                  nchunks: int = df64.DF64_CHUNKS):
    """df64 column transform from chunked operands.

    out[(r, c), Q, cell] = sum_b x[(r, b), Q, cell] M[r, b, c], with
    x = fx * sum(xq), M = fm * sum(mq).  Per output bucket the (b,
    chunk-pair) contraction has d*nchunks <= 2^20 quanta — exact in one
    f32 accumulation.  Returns a df64 pair shaped like the state.
    """
    grid = xq.shape[2:]
    flat = int(np.prod(grid))
    x = xq.reshape(r, d, nchunks, -1)  # (r, b, q, nd*cells)
    parts = []
    zero = jnp.zeros_like(mq[:, 0])
    for b in range(nchunks):
        ms = jnp.stack([mq[:, b - q] if 0 <= b - q < nchunks else zero
                        for q in range(nchunks)], axis=1)  # (r, q, b, c)
        o = jnp.einsum("rbqx,rqbc->rcx", x, ms,
                       preferred_element_type=jnp.float32)
        parts.append((o, jnp.zeros_like(o)))
    hi, lo = _combine_buckets(parts)
    sc = fx * fm
    hi = (hi * sc).reshape((r * d, xq.shape[1] // nchunks) + grid)
    lo = (lo * sc).reshape((r * d, xq.shape[1] // nchunks) + grid)
    return hi, lo


def _ds_pair(x64):
    """Exact f64 -> df64 pair split (small arrays only)."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _pair_f64(p):
    return p[0].astype(jnp.float64) + p[1].astype(jnp.float64)


from .df64 import ds_add


def _ds_neg(p):
    return (-p[0], -p[1])


# ----------------------------------------------------------------------
# engines (df64 pair state; scan over recursion depth)


@partial(jax.jit, static_argnames=("lld", "hoh", "radius", "groups",
                                  "nb", "d", "unroll"))
def _block_lanczos_ms_jit(w, w_o, w_ons, mask_chan, psi0, scale, scale_o,
                          scale_ons, lld: int, hoh: bool, radius, groups,
                          nb: int, d: int, unroll: int = 1):
    from .block_lanczos import _eig_sqrt

    r = psi0.shape[0]
    psi0 = psi0.reshape((r * d,) + psi0.shape[2:])
    nd = psi0.shape[1]
    no_rad = (0, 0, 0)
    all_grp = ((0, w_ons.shape[1]),)

    def apply_h_from_chunks(xq, fx, psi):
        if hoh:
            # H = h - eeo.(h psi) + (enim + ls) psi (hop_b_hoh :1411)
            h1 = conv_chunks(w, xq, fx, scale, mask_chan, radius, groups)
            hq, fh = extract_scaled(h1)
            h2 = conv_chunks(w_o, hq, fh, scale_o, mask_chan, radius,
                             groups)
            ons = conv_chunks(w_ons, xq, fx, scale_ons, mask_chan,
                              no_rad, all_grp)
            return ds_add(ds_add(h1, _ds_neg(h2)), ons)
        return conv_chunks(w, xq, fx, scale, mask_chan, radius, groups)

    eye64 = jnp.eye(d, dtype=jnp.float64)

    def step(carry, _):
        psi, pmn, sum_b_prev = carry  # pairs; sum_b_prev f64 (r, d, d)
        xq, fx = extract_scaled(psi)
        hpsi = apply_h_from_chunks(xq, fx, psi)
        hq, fh = extract_scaled(hpsi)
        a_ll = gram_chunks(xq, fx, hq, fh, r, d, nd)
        aq, fa = extract_small(a_ll)
        t = colmul_chunks(xq, fx, aq, fa, r, d)
        pmn = ds_add(ds_add(hpsi, _ds_neg(pmn)), _ds_neg(t))
        pq, fp = extract_scaled(pmn)
        b2 = gram_chunks(pq, fp, pq, fp, r, d, nd)
        b2_64 = _pair_f64(b2)
        b, b_i = _eig_sqrt(b2_64)  # small (r, d, d) emulated f64
        biq, fbi = extract_small(_ds_pair(b_i))
        bq, fb = extract_small(_ds_pair(b))
        psi_new = colmul_chunks(pq, fp, biq, fbi, r, d)
        pmn_new = colmul_chunks(xq, fx, bq, fb, r, d)
        a_ll64 = _pair_f64(a_ll)
        return (psi_new, pmn_new, b2_64), (a_ll64, sum_b_prev)

    pmn0 = (jnp.zeros_like(psi0), jnp.zeros_like(psi0))
    sum_b0 = jnp.broadcast_to(eye64, (r, d, d))
    psi0p = (psi0, jnp.zeros_like(psi0))
    (psi, pmn, sum_b), (a_b, b2_b) = jax.lax.scan(
        step, (psi0p, pmn0, sum_b0), None, length=lld - 1, unroll=unroll)
    a_b = jnp.concatenate([a_b, jnp.zeros((1, r, d, d), a_b.dtype)], axis=0)
    b2_b = jnp.concatenate([b2_b, sum_b[None]], axis=0)
    return a_b, b2_b


@partial(jax.jit, static_argnames=("lld", "hoh", "radius",
                                  "groups", "nb", "d", "unroll"))
def _chebyshev_ms_jit(w, w_o, w_ons, mask_chan, psi0, scale, scale_o,
                      scale_ons, ainv_p, b_p, lld: int, hoh: bool,
                      radius, groups, nb: int, d: int, unroll: int = 1):
    r = psi0.shape[0]
    psi0 = psi0.reshape((r * d,) + psi0.shape[2:])
    nd = psi0.shape[1]
    no_rad = (0, 0, 0)
    all_grp = ((0, w_ons.shape[1]),)

    # ainv_p / b_p: scaled-H constants as exact df64 pairs, split on the
    # host (a single-f32 1/a is 6e-8 off and poisons every moment —
    # stencil_conv learned this)
    from .df64 import ds_mul

    def apply_ht_from_chunks(xq, fx, psi):
        if hoh:
            h1 = conv_chunks(w, xq, fx, scale, mask_chan, radius, groups)
            hq, fh = extract_scaled(h1)
            h2 = conv_chunks(w_o, hq, fh, scale_o, mask_chan, radius,
                             groups)
            ons = conv_chunks(w_ons, xq, fx, scale_ons, mask_chan,
                              no_rad, all_grp)
            hpsi = ds_add(ds_add(h1, _ds_neg(h2)), ons)
        else:
            hpsi = conv_chunks(w, xq, fx, scale, mask_chan, radius,
                               groups)
        num = ds_add(hpsi, _ds_neg(ds_mul(b_p, psi)))
        return ds_mul(ainv_p, num)

    psi0p = (psi0, jnp.zeros_like(psi0))
    x0q, f0 = extract_scaled(psi0p)
    mu0 = _pair_f64(gram_chunks(x0q, f0, x0q, f0, r, d, nd))
    psi1 = apply_ht_from_chunks(x0q, f0, psi0p)
    x1q, f1 = extract_scaled(psi1)
    mu1 = _pair_f64(gram_chunks(x1q, f1, x0q, f0, r, d, nd))

    def step(carry, _):
        # carry: (p0 pair, p1 pair, p1 chunks, p1 factor)
        p0, p1, x1q_, f1_ = carry
        ht = apply_ht_from_chunks(x1q_, f1_, p1)
        p2 = ds_add(ds_add(ht, ht), _ds_neg(p0))
        x2q, f2 = extract_scaled(p2)
        d1 = _pair_f64(gram_chunks(x1q_, f1_, x1q_, f1_, r, d, nd))
        d2 = _pair_f64(gram_chunks(x2q, f2, x1q_, f1_, r, d, nd))
        return (p1, p2, x2q, f2), (2.0 * d1 - mu0, 2.0 * d2 - mu1)

    (_, _, _, _), (mu_odd, mu_even) = jax.lax.scan(
        step, (psi0p, psi1, x1q, f1), None, length=lld, unroll=unroll)
    mu = jnp.zeros((2 * lld + 2, r, d, d), dtype=jnp.float64)
    mu = mu.at[0].set(mu0).at[1].set(mu1)
    mu = mu.at[2::2].set(mu_odd)
    mu = mu.at[3::2].set(mu_even)
    return mu



# ----------------------------------------------------------------------
# host-side wrappers


def grid_embed(st: MSStencil, psi0: np.ndarray, d: int) -> np.ndarray:
    """Embed (R, kk[+1], D, D) start blocks into the conv grid layout
    (R, D, ntot*D, nx, ny, nz); column axis leads (conv batch)."""
    psi0 = np.asarray(psi0)
    r = psi0.shape[0]
    nx, ny, nz = st.dims
    out = np.zeros((r, d, st.ntot * d, nx, ny, nz), psi0.dtype)
    rows = (st.basis[:, None] * d + np.arange(d)[None, :])  # (kk, D)
    # out[r, c, row, cell] = psi0[r, i, q, c]
    out[:, :, rows,
        st.cells[:, 0][:, None], st.cells[:, 1][:, None],
        st.cells[:, 2][:, None]] = psi0[:, :st.kk].transpose(0, 3, 1, 2)
    return out


class MSEngine:
    """Packed multi-site engine for one (cluster, Hamiltonian) pair.

    Build once per SCF iteration (the kernel depends on the Hamiltonian);
    the stencil geometry is cached on the cluster by the caller.
    """

    def __init__(self, st: MSStencil, hs, lsham, *, hoh=False, hso=None,
                 enim=None):
        from .block_lanczos import realify_blocks

        self.st = st
        self.d = 2 * hs.shape[-1]  # realified block dim
        hs_r = realify_blocks(np.asarray(hs))
        ls_r = realify_blocks(np.asarray(lsham))
        self.hoh = bool(hoh)
        if self.hoh:
            en_r = realify_blocks(np.asarray(enim))
            self.w, self.scale, self.radius, self.groups = \
                pack_ms_kernel_df64(hs_r, st)
            self.w_o, self.scale_o, rad_o, grp_o = pack_ms_kernel_df64(
                realify_blocks(np.asarray(hso)), st)
            if rad_o != self.radius:
                raise ValueError("hoh kernel radius mismatch")
            # refine both partitions so each partial conv is exact for
            # BOTH kernels
            bounds = sorted({p for g in self.groups for p in g}
                            | {p for g in grp_o for p in g})
            self.groups = tuple(zip(bounds[:-1], bounds[1:]))
            self.w_ons, self.scale_ons = pack_ms_onsite_df64(
                en_r + ls_r, st)
        else:
            hs_fold = hs_r.copy()
            hs_fold[:, 0] += ls_r  # lsham folds into the onsite slot
            self.w, self.scale, self.radius, self.groups = \
                pack_ms_kernel_df64(hs_fold, st)
            self.w_o = self.w  # placeholder (same shape, unused)
            self.scale_o = self.scale
            nchunks = df64.DF64_CHUNKS
            nd = nchunks * st.ntot * self.d
            self.w_ons = jnp.zeros((nd, nd, 1, 1, 1), jnp.bfloat16)
            self.scale_ons = 1.0
        self.mask_chan = jnp.asarray(mask_channels(st, self.d))

    # -- start blocks --------------------------------------------------
    def embed(self, psi0_complex: np.ndarray) -> jnp.ndarray:
        from .block_lanczos import realify_blocks

        return jnp.asarray(grid_embed(
            self.st, realify_blocks(np.asarray(psi0_complex)),
            self.d).astype(np.float32))

    # -- engines -------------------------------------------------------
    def block_lanczos(self, psi0_grid, lld: int):
        from .block_lanczos import unrealify_blocks

        unroll = max(1, lld - 1) if jax.default_backend() == "cpu" else 1
        a_b, b2_b = _block_lanczos_ms_jit(
            self.w, self.w_o, self.w_ons, self.mask_chan, psi0_grid,
            jnp.float32(self.scale), jnp.float32(self.scale_o),
            jnp.float32(self.scale_ons),
            lld, self.hoh, self.radius, self.groups, self.st.ntot,
            self.d, unroll)
        return (unrealify_blocks(np.asarray(a_b)),
                unrealify_blocks(np.asarray(b2_b)))

    def chebyshev_moments(self, psi0_grid, lld: int, a: float, b: float):
        from .block_lanczos import unrealify_blocks

        unroll = max(1, lld) if jax.default_backend() == "cpu" else 1
        ainv = 1.0 / float(a)
        ainv_p = (np.float32(ainv),
                  np.float32(ainv - np.float64(np.float32(ainv))))
        b_p = (np.float32(b), np.float32(float(b) - np.float64(np.float32(b))))
        mu = _chebyshev_ms_jit(
            self.w, self.w_o, self.w_ons, self.mask_chan, psi0_grid,
            jnp.float32(self.scale), jnp.float32(self.scale_o),
            jnp.float32(self.scale_ons),
            (jnp.asarray(ainv_p[0]), jnp.asarray(ainv_p[1])),
            (jnp.asarray(b_p[0]), jnp.asarray(b_p[1])),
            lld, self.hoh, self.radius, self.groups,
            self.st.ntot, self.d, unroll)
        return unrealify_blocks(np.asarray(mu))
