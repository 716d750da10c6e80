"""Fused Pallas flat-stencil df64 engine vs the XLA conv engine and the
complex128 reference recursion (interpret mode, CPU).

The Pallas kernel (``ops/pallas_conv.py``) is the fused rewrite of the
bucket-conv SpMV of ``ops/stencil_conv.py`` (reference hot loop ``hop``,
``source/recursion.f90:3310``): 27 MXU GEMMs per (chain, plane) cell with
in-kernel df64 bucket recombination and cluster masking.  These tests run
the kernel through the Pallas interpreter so the CPU suite covers the
same code path the TPU executes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import (
    lanczos_coefficients,
    scalar_start_vectors,
    split_complex,
)
from rslmtoasa_tpu.ops.stencil_conv import (
    build_conv_stencil,
    conv_spmv_df64,
    pack_conv_kernel_df64,
)
from rslmtoasa_tpu.ops import pallas_conv as pc


@pytest.fixture(scope="module")
def small_system():
    sys_ = build_synthetic_bcc(rc=16.0, ndim=4000, lld=6)
    st = build_conv_stencil(sys_.cluster)
    fs = pc.build_flat_stencil(st)
    hs_split = np.asarray(split_complex(np.asarray(sys_.ham.ee[0, :, :9, :9])))
    return sys_, st, fs, hs_split


def test_flat_spmv_matches_conv_engine(small_system):
    """One df64 SpMV: fused Pallas kernel == XLA bucket conv (exactly the
    same chunk grids, so agreement is to f64 roundoff)."""
    sys_, st, fs, hs_split = small_system
    w_conv, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
    wt, hsc, dxs, colshifts = pc.pack_flat_kernel(hs_split, st)

    rng = np.random.default_rng(3)
    c = 4
    psi_box = (rng.standard_normal((c, 18) + st.dims)
               * st.mask[None, None]).astype(np.float32)
    psi_ds = (jnp.asarray(psi_box), jnp.zeros_like(jnp.asarray(psi_box)))
    v_ref = conv_spmv_df64(jnp.asarray(w_conv), h_scale,
                           jnp.asarray(st.mask), psi_ds, 7, radius)
    v_ref = np.asarray(v_ref[0], np.float64) + np.asarray(v_ref[1],
                                                          np.float64)

    flat = np.zeros((c, fs.nxp, 18, fs.roww), np.float32)
    flat[:, fs.planes, :, fs.cols] = np.moveaxis(
        psi_box[:, :, st.coords[:, 0], st.coords[:, 1], st.coords[:, 2]],
        2, 0)
    pf = (jnp.asarray(flat), jnp.zeros_like(jnp.asarray(flat)))
    vh, vl, aph, apl = pc.conv_spmv_df64_pallas(
        wt, jnp.asarray(fs.mask), pf, hsc, nchunks=7, d=18, dxs=dxs,
        colshifts=colshifts, interpret=True)
    vfl = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
    # the fused partial-dot maps must sum to <v|psi> per chain
    apart = (np.asarray(aph, np.float64)
             + np.asarray(apl, np.float64)).sum(axis=(1, 2, 3))
    flat64 = flat.astype(np.float64)
    want = np.einsum("cpdr,cpdr->c", vfl, flat64)
    assert np.abs(apart - want).max() <= 1e-12 * max(1.0, np.abs(want).max())
    vg = vfl[:, fs.planes, :, fs.cols]  # (kk, c, 18)
    ref = np.moveaxis(
        v_ref[:, :, st.coords[:, 0], st.coords[:, 1], st.coords[:, 2]],
        2, 0)
    scale = np.abs(v_ref).max()
    assert np.abs(vg - ref).max() <= 1e-12 * scale


@pytest.mark.parametrize("roll", [False, True])
def test_flat_lanczos_matches_complex128(small_system, roll):
    """Full Haydock recursion through the Pallas kernel vs the complex128
    ELL engine (``crecal`` conventions, recursion.f90:3423) — both the
    blocked-window and the rolling-DMA kernels."""
    sys_, st, fs, hs_split = small_system
    hb = sys_.ham
    blk = hb.ee[:, :, :9, :9]
    lld = 6
    psi0 = scalar_start_vectors(sys_.cluster.kk, [0, 3])
    a_ref, b_ref = lanczos_coefficients(
        jnp.asarray(blk), jnp.asarray(hb.iz), jnp.asarray(hb.cols),
        jnp.asarray(psi0), lld)
    wt, hsc, dxs, colshifts = pc.pack_flat_kernel(hs_split, st)
    p0 = pc.flat_start_vectors(fs, [0, 3], 18, orbitals=range(9))
    a, b2 = pc.lanczos_coefficients_flat_df64(
        wt, hsc, fs.mask, p0, lld, dxs=dxs, colshifts=colshifts,
        interpret=True, roll=roll)
    assert np.abs(a - np.asarray(a_ref)).max() < 1e-11
    assert np.abs(b2 - np.asarray(b_ref)).max() < 1e-11
