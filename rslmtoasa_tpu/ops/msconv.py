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
    #: per-atom 0-based types when some basis carries MULTIPLE types
    #: (surface slabs: types per layer); None for type-pure bases
    atom_type: Optional[np.ndarray] = None


def build_ms_stencil(cl) -> MSStencil:
    """Multi-site cell-grid embedding of a crystal cluster.

    Raises ValueError for clusters without a constant-offset stencil
    (impurity ``hall`` zones, wrapped PBC, surface layers with per-layer
    types) — callers fall back to the gather engine.
    """
    if cl.nn is None or cl.dirs is None:
        raise ValueError("cluster has no neighbor map")
    # impurity local zones keep the lattice geometry (newclu re-types
    # atoms in place); their per-atom hall rows become small gather
    # corrections in MSEngine, so they are NOT a stencil obstruction
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
    # per-basis types: type-pure bases (bulk crystals) use the plain
    # kernel; bases carrying multiple types (surface slabs: one type
    # per layer) get masked delta-kernel corrections (see MSEngine) —
    # the geometry must still be a constant-offset sublattice, but the
    # type distribution over it is arbitrary
    basis_type = np.full(nb, -1, np.int64)
    iz0 = (np.asarray(cl.iz) - 1).astype(np.int64)
    layered = False
    for b in range(nb):
        sel = basis == b
        if not sel.any():
            raise ValueError(f"basis {b} has no atoms")
        tt = np.unique(iz0[sel])
        if tt.size != 1:
            layered = True
            # dominant (bulk) type carries the main kernel
            basis_type[b] = np.bincount(iz0[sel]).argmax()
        else:
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
    atom_type = iz0 if layered else None
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
                     slot_ok=slot_ok, mask=mask, kk=cl.kk,
                     atom_type=atom_type)


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
    w5 = w.reshape(nchunks, nb, d, nchunks, nb, d, kd, kh, kw)
    qs = np.arange(nchunks)
    for b_out in range(nb):
        t = int(st.basis_type[b_out])
        for m in range(nslots):
            if not st.slot_ok[b_out, m]:
                continue
            b_in = int(st.nbasis[b_out, m])
            tx, ty, tz = (int(v) for v in st.dcells[b_out, m] + r)
            for p in range(nchunks):
                q = qs[:nchunks - p]
                # bucket s = q + p for every q at once
                w5[q + p, b_out, :, q, b_in, :, tx, ty, tz] += ch[p, t, m]

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
    """One multi-site df64 SpMV: y = H psi via bucket convs.

    psi_ds: (hi, lo) of (C, ntot*D, nx, ny, nz) f32; w as packed above;
    mask_chan (ntot*D, nx, ny, nz).  Returns a df64 pair.  Thin wrapper
    over chunk extraction + :func:`conv_chunks`.
    """
    x = _extract_chunks_chan(psi_ds, nchunks)
    # the extraction carries a 1/2 pre-scale -> factor 2
    return conv_chunks(w, x, jnp.float32(2.0), scale, mask_chan, radius,
                       groups, nchunks)


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
    packed.  Two execution modes, chosen by a flop model:

    * small problems: ONE fused conv over all output buckets (exactness
      via the packed channel ``groups``) — kernel-launch overhead
      dominates at these sizes (measured ~5 ms/launch on the axon
      backend);
    * large problems: per-bucket truncated convs — output bucket s only
      convolves input chunks q <= s (sum_s (s+1) = 28 channel-block
      products instead of 49), and buckets s >= 4 skip the exactness
      grouping (their 2^-28 weight puts plain-f32 accumulation error
      below the df64 target).
    """
    pad = [(int(r), int(r)) for r in radius]
    nd = w.shape[0] // nchunks
    cells = int(np.prod(xq.shape[2:]))
    window = int(np.prod([2 * int(r) + 1 for r in radius]))
    fused_flops = 2.0 * xq.shape[0] * cells * window * (nchunks * nd) ** 2
    if fused_flops < 5e12:
        # fused: one conv per exactness group over ALL buckets
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
        outs = [(acc_hi[:, t * nd:(t + 1) * nd],
                 acc_lo[:, t * nd:(t + 1) * nd]) for t in range(nchunks)]
    else:
        outs = []
        for t in range(nchunks):
            cmax = (t + 1) * nd
            if t >= 4:
                gs = [(0, cmax)]
            else:
                gs = []
                for (c0, c1) in groups:
                    if c0 >= cmax:
                        break
                    gs.append((c0, min(c1, cmax)))
            acc_hi = None
            acc_lo = None
            ws = w[t * nd:(t + 1) * nd]
            for (c0, c1) in gs:
                o = lax.conv_general_dilated(
                    xq[:, c0:c1], ws[:, c0:c1], window_strides=(1, 1, 1),
                    padding=pad,
                    dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
                    preferred_element_type=jnp.float32,
                )
                if acc_hi is None:
                    acc_hi, acc_lo = o, jnp.zeros_like(o)
                else:
                    acc_hi, e = two_sum(acc_hi, o)
                    acc_lo = acc_lo + e
            outs.append((acc_hi, acc_lo))
    hi, lo = _combine_buckets(outs)
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
    # every partial is exact f32, so ONE compensated fold over the
    # whole (chunk-pair x segment) axis is error-free — two_sum needs
    # no same-quantum assumption; chunk pairs beyond p+q > 6 are below
    # 2^-49 and dropped (matching the conv kernel)
    sel = [partial[pp, b - pp] for b in range(nchunks)
           for pp in range(nchunks) if 0 <= b - pp < nchunks]
    stack = jnp.concatenate(sel, axis=1)  # (r, Npq*seg, a, c)
    stack = jnp.moveaxis(stack, 1, 0)
    hi, lo = _fold_first(stack, jnp.zeros_like(stack))
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
    x = fx * sum(xq), M = fm * sum(mq).  One einsum computes every
    output bucket at once (contraction (q, b) = nchunks*d <= 2^20
    quanta — exact), then a compensated fold over the bucket axis.
    Returns a df64 pair shaped like the state.
    """
    grid = xq.shape[2:]
    x = xq.reshape(r, d, nchunks, -1)  # (r, b, q, nd*cells)
    zero = jnp.zeros_like(mq[:, 0])
    ms = jnp.stack([
        jnp.stack([mq[:, b - q] if 0 <= b - q < nchunks else zero
                   for q in range(nchunks)], axis=1)
        for b in range(nchunks)], axis=1)  # (r, s, q, b, c)
    o = jnp.einsum("rbqx,rsqbc->rscx", x, ms,
                   preferred_element_type=jnp.float32)  # (r, s, c, X)
    stack = jnp.moveaxis(o, 1, 0)  # (s, r, c, X)
    hi, lo = _fold_first(stack, jnp.zeros_like(stack))
    sc = fx * fm
    hi = (hi * sc).reshape((r * d, xq.shape[1] // nchunks) + grid)
    lo = (lo * sc).reshape((r * d, xq.shape[1] // nchunks) + grid)
    return hi, lo


def _ds_pair(x64):
    """Exact f64 -> df64 pair split (small arrays only)."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _eig_sqrt_f32seed(b2):
    """B = sqrt(b2), B^-1 for real SPD (r, d, d) f64 blocks with an f32
    eigh seed.  The emulated-f64 eigh costs ~57 ms/step on the axon
    backend; the f32 eigh is a fast native kernel and two Newton/
    Babylonian cycles (matmuls only — cheap at this size even emulated)
    square the 2^-24 seed error to f64 roundoff
    (same refinement as block_lanczos._eig_sqrt)."""
    ev32, u32 = jnp.linalg.eigh(b2.astype(jnp.float32))
    ev = ev32.astype(jnp.float64)
    u = u32.astype(jnp.float64)
    ev = jnp.maximum(ev, 1e-300 + 1e-12 * ev[..., -1:])
    lam = jnp.sqrt(ev)
    b = jnp.einsum("...ab,...b,...cb->...ac", u, lam, u)
    b_i = jnp.einsum("...ab,...b,...cb->...ac", u, 1.0 / lam, u)
    eye = jnp.eye(b2.shape[-1], dtype=b2.dtype)
    mm = lambda x, y: jnp.einsum("...ab,...bc->...ac", x, y)
    herm = lambda x: 0.5 * (x + jnp.swapaxes(x, -1, -2))
    for _ in range(2):
        b_i = mm(b_i, 2.0 * eye - mm(b, b_i))
        b = herm(0.5 * (b + mm(b2, b_i)))
    b_i = herm(mm(b_i, 2.0 * eye - mm(b, b_i)))
    return b, b_i


def _pair_f64(p):
    return p[0].astype(jnp.float64) + p[1].astype(jnp.float64)


from .df64 import ds_add


def _ds_neg(p):
    return (-p[0], -p[1])


# ----------------------------------------------------------------------
# engines (df64 pair state; scan over recursion depth)
#
# Both engines are exposed as STAGE functions carrying their full state,
# so the host driver can run the recursion on a growing subgrid — the
# active-set wavefront device (create_ll_map, recursion.f90:3277-3303)
# composed with the conv engines: after k steps the wavefront has
# reached at most k tap-radii from the start cells, so early steps run
# on a small box and the full grid is only touched by the last stage.


def _local_corr(y, x_pair, delta64, chan_idx, cell_idx, out_idx):
    """Per-atom impurity correction (the ``hall`` local rows,
    hamiltonian.f90 build_locham): y[local atom] += sum_m
    (hall[i,m] - ee[type_i,m]) x[neighbor].  nmax is small, so the
    gather + einsum runs in emulated f64 on tiny arrays and the result
    scatter-adds into the pair with a compensated update."""
    r36 = x_pair[0].shape[0]
    nd = x_pair[0].shape[1]
    xf = (x_pair[0].reshape(r36, nd, -1), x_pair[1].reshape(r36, nd, -1))
    xg = (xf[0][:, chan_idx, cell_idx[..., None]]
          .astype(jnp.float64)
          + xf[1][:, chan_idx, cell_idx[..., None]].astype(jnp.float64))
    # xg: (r36, nmax, nslots, D)
    corr = jnp.einsum("rimq,impq->rip", xg, delta64)
    ch = corr.astype(jnp.float32)
    cl_ = (corr - ch.astype(jnp.float64)).astype(jnp.float32)
    yh = y[0].reshape(r36, -1)
    yl = y[1].reshape(r36, -1)
    old = yh[:, out_idx]
    snew, e = two_sum(old, ch.reshape(r36, -1))
    yh = yh.at[:, out_idx].set(snew)
    yl = yl.at[:, out_idx].add(e + cl_.reshape(r36, -1))
    return (yh.reshape(y[0].shape), yl.reshape(y[1].shape))


def _conv_corr(w, scale, corr_list, xq, fx, mask_chan, radius, groups):
    """One kernel family: main conv + masked delta convs for surface
    layers whose type differs from the basis's dominant (bulk) type —
    the zmask restricts each correction to its own z-planes, so the
    composite equals the per-layer-type operator exactly."""
    y = conv_chunks(w, xq, fx, scale, mask_chan, radius, groups)
    for (wc, sc, zm) in corr_list:
        y = ds_add(y, conv_chunks(wc, xq, fx, sc, zm, radius, groups))
    return y


def _apply_h_chunks(w, w_o, w_ons, corr, mask_chan, scale, scale_o,
                    scale_ons, radius, groups, hoh, xq, fx, x_pair=None,
                    local=None):
    no_rad = (0, 0, 0)
    all_grp = ((0, w_ons.shape[1]),)
    cm, co, cons = corr
    if hoh:
        # H = h - eeo.(h psi) + (enim + ls) psi (hop_b_hoh :1411)
        h1 = _conv_corr(w, scale, cm, xq, fx, mask_chan, radius, groups)
        if local is not None:
            h1 = _local_corr(h1, x_pair, local["delta"], local["chan"],
                             local["cell"], local["out"])
        hq, fh = extract_scaled(h1)
        h2 = _conv_corr(w_o, scale_o, co, hq, fh, mask_chan, radius,
                        groups)
        if local is not None:
            h2 = _local_corr(h2, h1, local["delta_o"], local["chan"],
                             local["cell"], local["out"])
        ons = _conv_corr(w_ons, scale_ons, cons, xq, fx, mask_chan,
                         no_rad, all_grp)
        return ds_add(ds_add(h1, _ds_neg(h2)), ons)
    y = _conv_corr(w, scale, cm, xq, fx, mask_chan, radius, groups)
    if local is not None:
        y = _local_corr(y, x_pair, local["delta"], local["chan"],
                        local["cell"], local["out"])
    return y


@partial(jax.jit, static_argnames=("nsteps", "hoh", "radius", "groups",
                                  "nb", "d", "unroll"))
def _block_stage_ms_jit(w, w_o, w_ons, corr, local, mask_chan, psi, pmn,
                        sum_b, scale, scale_o, scale_ons, nsteps: int,
                        hoh: bool, radius, groups, nb: int, d: int,
                        unroll: int = 1):
    """nsteps of the block recursion from a full carry.  psi/pmn are
    df64 pairs (r*d, nd, *grid); sum_b is f64 (r, d, d).  Returns the
    advanced carry plus the emitted (a_ll, b2) blocks."""
    from .block_lanczos import _eig_sqrt

    r = sum_b.shape[0]
    nd = psi[0].shape[1]
    apply_h = partial(_apply_h_chunks, w, w_o, w_ons, corr, mask_chan,
                      scale, scale_o, scale_ons, radius, groups, hoh,
                      local=local)

    def step(carry, _):
        psi, pmn, sum_b_prev = carry
        xq, fx = extract_scaled(psi)
        hpsi = apply_h(xq, fx, x_pair=psi)
        hq, fh = extract_scaled(hpsi)
        a_ll = gram_chunks(xq, fx, hq, fh, r, d, nd)
        aq, fa = extract_small(a_ll)
        t = colmul_chunks(xq, fx, aq, fa, r, d)
        pmn = ds_add(ds_add(hpsi, _ds_neg(pmn)), _ds_neg(t))
        pq, fp = extract_scaled(pmn)
        b2 = gram_chunks(pq, fp, pq, fp, r, d, nd)
        b2_64 = _pair_f64(b2)
        # NOTE: an f32-seeded eigh + Newton refinement
        # (_eig_sqrt_f32seed) is ~50 ms/step cheaper but loses the
        # small eigenvalues of ill-conditioned late-recursion B^2
        # blocks beyond what the refinement can recover — measured
        # parity failures at lld >= 6.  Emulated-f64 eigh it is.
        b, b_i = _eig_sqrt(b2_64)  # small (r, d, d) emulated f64
        biq, fbi = extract_small(_ds_pair(b_i))
        bq, fb = extract_small(_ds_pair(b))
        psi_new = colmul_chunks(pq, fp, biq, fbi, r, d)
        pmn_new = colmul_chunks(xq, fx, bq, fb, r, d)
        a_ll64 = _pair_f64(a_ll)
        return (psi_new, pmn_new, b2_64), (a_ll64, sum_b_prev)

    (psi, pmn, sum_b), (a_b, b2_b) = jax.lax.scan(
        step, (psi, pmn, sum_b), None, length=nsteps, unroll=unroll)
    return psi, pmn, sum_b, a_b, b2_b


@partial(jax.jit, static_argnames=("hoh", "radius", "groups", "nb", "d"))
def _cheb_init_ms_jit(w, w_o, w_ons, corr, local, mask_chan, psi0, scale,
                      scale_o, scale_ons, ainv_p, b_p, hoh: bool, radius,
                      groups, nb: int, d: int):
    """First Chebyshev application + mu0/mu1 (T_0, T_1 seeds)."""
    r = psi0.shape[0]
    psi0 = psi0.reshape((r * d,) + psi0.shape[2:])
    nd = psi0.shape[1]
    from .df64 import ds_mul

    apply_h = partial(_apply_h_chunks, w, w_o, w_ons, corr, mask_chan,
                      scale, scale_o, scale_ons, radius, groups, hoh,
                      local=local)
    psi0p = (psi0, jnp.zeros_like(psi0))
    x0q, f0 = extract_scaled(psi0p)
    mu0 = _pair_f64(gram_chunks(x0q, f0, x0q, f0, r, d, nd))
    hpsi = apply_h(x0q, f0, x_pair=psi0p)
    num = ds_add(hpsi, _ds_neg(ds_mul(b_p, psi0p)))
    psi1 = ds_mul(ainv_p, num)
    x1q, f1 = extract_scaled(psi1)
    mu1 = _pair_f64(gram_chunks(x1q, f1, x0q, f0, r, d, nd))
    return psi0p, psi1, mu0, mu1


@partial(jax.jit, static_argnames=("nsteps", "hoh", "radius", "groups",
                                  "nb", "d", "unroll"))
def _cheb_stage_ms_jit(w, w_o, w_ons, corr, local, mask_chan, p0, p1,
                       mu0, mu1, scale, scale_o, scale_ons, ainv_p, b_p,
                       nsteps: int, hoh: bool, radius, groups,
                       nb: int, d: int, unroll: int = 1):
    """nsteps of the Chebyshev doubling recursion from (T_{k-1}, T_k)."""
    r = mu0.shape[0]
    nd = p0[0].shape[1]
    from .df64 import ds_mul

    apply_h = partial(_apply_h_chunks, w, w_o, w_ons, corr, mask_chan,
                      scale, scale_o, scale_ons, radius, groups, hoh,
                      local=local)

    def apply_ht(xq, fx, psi):
        hpsi = apply_h(xq, fx, x_pair=psi)
        num = ds_add(hpsi, _ds_neg(ds_mul(b_p, psi)))
        return ds_mul(ainv_p, num)

    def step(carry, _):
        p0_, p1_ = carry
        x1q, f1 = extract_scaled(p1_)
        ht = apply_ht(x1q, f1, p1_)
        p2 = ds_add(ds_add(ht, ht), _ds_neg(p0_))
        x2q, f2 = extract_scaled(p2)
        d1 = _pair_f64(gram_chunks(x1q, f1, x1q, f1, r, d, nd))
        d2 = _pair_f64(gram_chunks(x2q, f2, x1q, f1, r, d, nd))
        return (p1_, p2), (2.0 * d1 - mu0, 2.0 * d2 - mu1)

    (p0, p1), (mu_odd, mu_even) = jax.lax.scan(
        step, (p0, p1), None, length=nsteps, unroll=unroll)
    return p0, p1, mu_odd, mu_even


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
                 enim=None, local=None):
        from .block_lanczos import realify_blocks

        self.st = st
        self.d = 2 * hs.shape[-1]  # realified block dim
        hs_r = realify_blocks(np.asarray(hs))
        ls_r = realify_blocks(np.asarray(lsham))
        self.hoh = bool(hoh)
        self.local = None
        if local is not None and int(local.get("nmax", 0)) > 0:
            self.local = self._build_local(local, hs_r, hso, st)
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
        # surface slabs: masked delta-kernel corrections for layers whose
        # type differs from the basis's dominant type (one per special
        # (basis, type); applied as extra convs restricted by zmask)
        self.corr_main = ()
        self.corr_o = ()
        self.corr_ons = ()
        if st.atom_type is not None:
            import dataclasses

            def zmask_chan(b, t):
                m = np.zeros_like(st.mask)
                sel = (st.basis == b) & (st.atom_type == t)
                cc = st.cells[sel]
                m[b, cc[:, 0], cc[:, 1], cc[:, 2]] = 1.0
                return jnp.asarray(np.repeat(m, self.d, axis=0))

            def deltas(table_fn):
                out = []
                for b in range(st.ntot):
                    tmain = int(st.basis_type[b])
                    tset = sorted(set(
                        int(x) for x in st.atom_type[st.basis == b]
                        if x != tmain))
                    for t in tset:
                        hsd = np.zeros((st.ntot,) + table_fn(0).shape)
                        hsd[b] = table_fn(t) - table_fn(tmain)
                        if np.abs(hsd).max() < 1e-300:
                            continue
                        out.append((b, t, hsd))
                return out

            st_id = dataclasses.replace(
                st, basis_type=np.arange(st.ntot, dtype=np.int64))
            all_groups = set(self.groups)
            if self.hoh:
                fam = [("corr_main", lambda t: hs_r[t]),
                       ("corr_o",
                        lambda t: realify_blocks(np.asarray(hso))[t]),
                       ("corr_ons", lambda t: (en_r + ls_r)[t])]
            else:
                fam = [("corr_main", lambda t: hs_fold[t])]
            for name, fn in fam:
                cc = []
                for b, t, hsd in deltas(fn):
                    if name == "corr_ons":
                        wc, sc = pack_ms_onsite_df64(hsd, st_id)
                        gc = ((0, self.w_ons.shape[1]),)
                    else:
                        wc, sc, rad_c, gc = pack_ms_kernel_df64(hsd, st_id)
                        if rad_c != self.radius:
                            raise ValueError("correction radius mismatch")
                    all_groups |= set(gc)
                    cc.append((wc, jnp.float32(sc), zmask_chan(b, t)))
                setattr(self, name, tuple(cc))
            bounds = sorted({p for g in all_groups for p in g})
            self.groups = tuple(zip(bounds[:-1], bounds[1:]))

    # -- impurity local zone -------------------------------------------
    def _build_local(self, local, hs_r, hso, st):
        """Per-atom gather-correction tables for the impurity-local
        ``hall`` rows (hamiltonian.f90 ``build_locham``): the conv
        assigns ``ee[type_i]`` to every atom; nmax small deltas
        (hall[i] - ee[type_i]) restore the exact per-atom rows."""
        from .block_lanczos import realify_blocks

        nmax = int(local["nmax"])
        d = self.d
        cols = np.asarray(local["cols"])[:nmax]
        hall_r = realify_blocks(np.asarray(local["hall"]))
        at = (st.atom_type if st.atom_type is not None
              else st.basis_type[st.basis])
        tloc = np.asarray(at)[:nmax]
        delta = hall_r - hs_r[tloc]
        absent = cols >= st.kk
        delta[absent] = 0.0
        if self.hoh:
            hallo_r = realify_blocks(np.asarray(local["hallo"]))
            eeo_r = realify_blocks(np.asarray(hso))
            delta_o = hallo_r - eeo_r[tloc]
            delta_o[absent] = 0.0
        else:
            delta_o = np.zeros_like(delta)
        nx, ny, nz = st.dims
        cell_lin = ((st.cells[:, 0] * ny + st.cells[:, 1]) * nz
                    + st.cells[:, 2])
        j = np.where(absent, 0, cols)
        cellj = cell_lin[j]
        bj = st.basis[j]
        chan = bj[..., None] * d + np.arange(d)[None, None, :]
        ncell = nx * ny * nz
        out_idx = ((st.basis[:nmax, None] * d + np.arange(d)[None, :])
                   * ncell + cell_lin[:nmax, None])
        return {"delta": jnp.asarray(delta),
                "delta_o": jnp.asarray(delta_o),
                "chan": jnp.asarray(chan.astype(np.int32)),
                "cell": jnp.asarray(cellj.astype(np.int32)),
                "out": jnp.asarray(out_idx.ravel().astype(np.int32))}

    @property
    def corr(self):
        return (self.corr_main, self.corr_o, self.corr_ons)

    def _corr_sliced(self, bbox):
        """Correction triples with zmasks sliced to a stage subgrid."""
        if not (self.corr_main or self.corr_o or self.corr_ons):
            return ((), (), ())
        sl = lambda cc: tuple((w, s, self._slice_grid(zm, bbox))
                              for (w, s, zm) in cc)
        return (sl(self.corr_main), sl(self.corr_o), sl(self.corr_ons))

    # -- start blocks --------------------------------------------------
    def embed(self, psi0_complex: np.ndarray) -> jnp.ndarray:
        from .block_lanczos import realify_blocks

        return jnp.asarray(grid_embed(
            self.st, realify_blocks(np.asarray(psi0_complex)),
            self.d).astype(np.float32))

    # -- wavefront stage plan ------------------------------------------
    def start_bbox(self, psi0):
        """Cell bounding box of the nonzero start blocks (host psi0,
        (R, kk[+1], D, D))."""
        p = np.abs(np.asarray(psi0))[:, :self.st.kk]
        rows = np.nonzero(p.sum(axis=(0, 2, 3)))[0]
        cc = self.st.cells[rows]
        return tuple(cc.min(axis=0)), tuple(cc.max(axis=0))

    def stage_plan(self, bbox0, nsteps: int, first_ball: int = 1):
        """Greedy wavefront staging (the create_ll_map device,
        recursion.f90:3277-3303, composed with the conv engine): step i
        needs the box reached after (first_ball + i - 1 + 1) hop-radii.
        Returns [(nsteps_k, (lo, hi))] or None when dense is cheaper.
        """
        if self.local is not None:
            # impurity corrections index the FULL grid; subgrid staging
            # would need index remapping per stage — not composed yet
            return None
        hops = 2 if self.hoh else 1
        rad = np.asarray(self.radius)
        dims = np.asarray(self.st.dims)
        lo0 = np.asarray(bbox0[0])
        hi0 = np.asarray(bbox0[1])
        boxes, vols = [], []
        for i in range(nsteps):
            m = (first_ball + i) * hops
            lo = np.maximum(0, lo0 - m * rad)
            hi = np.minimum(dims, hi0 + 1 + m * rad)
            boxes.append((tuple(int(x) for x in lo),
                          tuple(int(x) for x in hi)))
            vols.append(int(np.prod(hi - lo)))
        full = int(np.prod(dims))
        plan = []
        i = 0
        while i < nsteps:
            j = i
            while j + 1 < nsteps and vols[j + 1] <= 2.5 * vols[i] \
                    and (j + 1 - i) < 48:
                j += 1
            plan.append((j - i + 1, boxes[j]))
            i = j + 1
        work = sum(n * int(np.prod(np.asarray(b[1]) - np.asarray(b[0])))
                   for n, b in plan)
        # even modest work savings win: the subgrid convs are the same
        # per-cell cost and stage-transition pads are cheap
        if work >= 0.85 * nsteps * full:
            return None
        return plan

    def _slice_grid(self, x, bbox):
        (x0, y0, z0), (x1, y1, z1) = bbox
        return x[..., x0:x1, y0:y1, z0:z1]

    @staticmethod
    def _pad_pair(pair, old_bbox, new_bbox):
        widths = [(0, 0)] * (pair[0].ndim - 3) + [
            (old_bbox[0][ax] - new_bbox[0][ax],
             new_bbox[1][ax] - old_bbox[1][ax]) for ax in range(3)]
        return (jnp.pad(pair[0], widths), jnp.pad(pair[1], widths))

    # -- engines -------------------------------------------------------
    def _chain_batch(self, r: int) -> int:
        """Largest chain batch the engine state fits in HBM: per-chain
        cost ~ ncells * ntot*D * 36 * (chunk bf16 + ~6 pair f32 arrays)
        bytes, times the live-temp multiplier of each correction conv
        and XLA's ~2x tile-padding on small spatial dims.  Override
        budget: RSLMTO_MS_HBM_BYTES (default 6 GiB)."""
        import os as _os

        budget = int(_os.environ.get("RSLMTO_MS_HBM_BYTES", 6 << 30))
        ncells = int(np.prod(self.st.dims))
        per = ncells * self.st.ntot * self.d * self.d * (14 + 48)
        per *= 2 * (1 + len(self.corr_main))  # layout padding + corr temps
        return max(1, min(r, budget // max(per, 1)))

    def block_lanczos(self, psi0_grid, lld: int, start_bbox=None):
        r = psi0_grid.shape[0]
        rb = self._chain_batch(r)
        if rb < r:
            parts = [self.block_lanczos(psi0_grid[i:i + rb], lld,
                                        start_bbox=start_bbox)
                     for i in range(0, r, rb)]
            return (np.concatenate([p[0] for p in parts], axis=1),
                    np.concatenate([p[1] for p in parts], axis=1))
        return self._block_lanczos_one(psi0_grid, lld, start_bbox)

    def _block_lanczos_one(self, psi0_grid, lld: int, start_bbox=None):
        """Block recursion -> (a_b, b2_b) complex (lld, R, 18, 18).

        With ``start_bbox`` the recursion runs wavefront-staged on
        growing subgrids when the plan predicts a win; otherwise dense.
        """
        from .block_lanczos import unrealify_blocks

        unroll_all = jax.default_backend() == "cpu"
        r, d = psi0_grid.shape[0], self.d
        flat = psi0_grid.reshape((r * d,) + psi0_grid.shape[2:])
        plan = None
        if start_bbox is not None and lld > 2:
            plan = self.stage_plan(start_bbox, lld - 1, first_ball=1)
        if plan is None:
            full_bbox = ((0, 0, 0), self.st.dims)
            plan = [(lld - 1, full_bbox)]
        args = (jnp.float32(self.scale), jnp.float32(self.scale_o),
                jnp.float32(self.scale_ons))
        psi = pmn = None
        sum_b = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float64), (r, d, d))
        prev = None
        a_parts, b_parts = [], []
        for nsteps, bbox in plan:
            if psi is None:
                lo, hi = bbox
                sub = flat[..., lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
                psi = (sub, jnp.zeros_like(sub))
                pmn = (jnp.zeros_like(sub), jnp.zeros_like(sub))
            else:
                psi = self._pad_pair(psi, prev, bbox)
                pmn = self._pad_pair(pmn, prev, bbox)
            mask_sub = self._slice_grid(self.mask_chan, bbox)
            unroll = nsteps if unroll_all else 1
            psi, pmn, sum_b, a_b, b2_b = _block_stage_ms_jit(
                self.w, self.w_o, self.w_ons, self._corr_sliced(bbox),
                self.local, mask_sub, psi, pmn, sum_b,
                *args, nsteps, self.hoh, self.radius, self.groups,
                self.st.ntot, d, unroll)
            a_parts.append(np.asarray(a_b))
            b_parts.append(np.asarray(b2_b))
            prev = bbox
        a_b = np.concatenate(a_parts + [np.zeros((1, r, d, d))], axis=0)
        b2_b = np.concatenate(b_parts + [np.asarray(sum_b)[None]], axis=0)
        return unrealify_blocks(a_b), unrealify_blocks(b2_b)

    def chebyshev_moments(self, psi0_grid, lld: int, a: float, b: float,
                          start_bbox=None):
        r = psi0_grid.shape[0]
        rb = self._chain_batch(r)
        if rb < r:
            parts = [self.chebyshev_moments(psi0_grid[i:i + rb], lld,
                                            a, b, start_bbox=start_bbox)
                     for i in range(0, r, rb)]
            return np.concatenate(parts, axis=1)
        return self._chebyshev_moments_one(psi0_grid, lld, a, b,
                                           start_bbox)

    def _chebyshev_moments_one(self, psi0_grid, lld: int, a: float,
                               b: float, start_bbox=None):
        """Chebyshev doubling moments -> mu complex (2*lld+2, R, 18, 18),
        optionally wavefront-staged."""
        from .block_lanczos import unrealify_blocks

        unroll_all = jax.default_backend() == "cpu"
        r, d = psi0_grid.shape[0], self.d
        ainv = 1.0 / float(a)
        ainv_p = (jnp.asarray(np.float32(ainv)),
                  jnp.asarray(np.float32(
                      ainv - np.float64(np.float32(ainv)))))
        b_p = (jnp.asarray(np.float32(b)),
               jnp.asarray(np.float32(
                   float(b) - np.float64(np.float32(b)))))
        args = (jnp.float32(self.scale), jnp.float32(self.scale_o),
                jnp.float32(self.scale_ons), ainv_p, b_p)
        plan = None
        if start_bbox is not None and lld > 2:
            # scan step j emits T_{j+1}: ball (j+1) applications deep
            plan = self.stage_plan(start_bbox, lld, first_ball=2)
        if plan is None:
            full_bbox = ((0, 0, 0), self.st.dims)
            init_bbox = full_bbox
            plan = [(lld, full_bbox)]
        else:
            # the init (T_1 = H~ T_0) needs one application's reach
            ip = self.stage_plan(start_bbox, 1, first_ball=1)
            init_bbox = ip[0][1] if ip else ((0, 0, 0), self.st.dims)
        lo, hi = init_bbox
        flat = psi0_grid[..., lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        mask_sub = self._slice_grid(self.mask_chan, init_bbox)
        p0, p1, mu0, mu1 = _cheb_init_ms_jit(
            self.w, self.w_o, self.w_ons, self._corr_sliced(init_bbox),
            self.local, mask_sub, flat, *args,
            self.hoh, self.radius, self.groups, self.st.ntot, d)
        odd_parts, even_parts = [], []
        prev = init_bbox
        for nsteps, bbox in plan:
            if bbox != prev:
                p0 = self._pad_pair(p0, prev, bbox)
                p1 = self._pad_pair(p1, prev, bbox)
            mask_sub = self._slice_grid(self.mask_chan, bbox)
            unroll = nsteps if unroll_all else 1
            p0, p1, mu_odd, mu_even = _cheb_stage_ms_jit(
                self.w, self.w_o, self.w_ons, self._corr_sliced(bbox),
                self.local, mask_sub, p0, p1, mu0, mu1,
                *args, nsteps, self.hoh, self.radius, self.groups,
                self.st.ntot, d, unroll)
            odd_parts.append(np.asarray(mu_odd))
            even_parts.append(np.asarray(mu_even))
            prev = bbox
        mu_odd = np.concatenate(odd_parts, axis=0)
        mu_even = np.concatenate(even_parts, axis=0)
        mu = np.zeros((2 * lld + 2, r, d, d))
        mu[0] = np.asarray(mu0)
        mu[1] = np.asarray(mu1)
        mu[2::2] = mu_odd
        mu[3::2] = mu_even
        return unrealify_blocks(mu)
