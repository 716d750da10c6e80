"""Multi-device sharding parity on the virtual 8-device CPU mesh.

The reference's only distribution axis is atoms/chains with
allreduce-sum collectives (``source/mpi.f90:32-58``; determinism across
rank counts is a stated property of its test suite).  These tests assert
the same property for the TPU layouts: every sharded formulation must
reproduce the single-device result to f64 round-off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_system():
    from rslmtoasa_tpu.models.presets import build_synthetic_bcc

    sys_ = build_synthetic_bcc(rc=8.0, ndim=2000, lld=6)
    return sys_.ham


def _padded_rows(hb, n_shards):
    """Pad rows to a multiple of the mesh size; sentinel columns >= kk_pad."""
    kk = hb.kk
    kk_pad = -(-kk // n_shards) * n_shards
    iz_p = np.zeros(kk_pad, np.int32)
    iz_p[:kk] = np.asarray(hb.iz)
    cols = np.asarray(hb.cols)
    cols_p = np.full((kk_pad, hb.nslots), kk_pad, np.int32)
    cols_p[:kk] = np.where(cols >= kk, kk_pad, cols)
    return kk_pad, iz_p, cols_p


def test_lanczos_chain_sharded_matches_unsharded(small_system):
    from rslmtoasa_tpu.ops.lanczos import (
        lanczos_coefficients,
        scalar_start_vectors,
    )
    from rslmtoasa_tpu.parallel.mesh import lanczos_sharded, make_mesh

    hb = small_system
    mesh = make_mesh(8)
    hs = jnp.asarray(hb.ee[:, :, :9, :9])
    iz = jnp.asarray(hb.iz)
    cols = jnp.asarray(hb.cols)
    psi0 = np.asarray(scalar_start_vectors(hb.kk, [0]))
    psi0 = np.tile(psi0, (1, 1, 2))[:, :, :16]  # 16 chains over 8 devices
    a_s, b2_s = lanczos_sharded(mesh, hs, iz, cols, jnp.asarray(psi0), 6)
    a_r, b2_r = lanczos_coefficients(hs, iz, cols, jnp.asarray(psi0), 6)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_r), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b2_s), np.asarray(b2_r), atol=1e-12)


def test_rowsharded_halo_spmv_matches_dense(small_system):
    from rslmtoasa_tpu.ops.lanczos import block_spmv
    from rslmtoasa_tpu.parallel.mesh import make_mesh, rowsharded_spmv_halo

    hb = small_system
    mesh = make_mesh(8)
    n_shards = 8
    kk_pad, iz_p, cols_p = _padded_rows(hb, n_shards)
    hs = jnp.asarray(hb.ee[:, :, :9, :9])

    rng = np.random.default_rng(7)
    psi = (rng.standard_normal((kk_pad, 9, 4))
           + 1j * rng.standard_normal((kk_pad, 9, 4)))
    psi[hb.kk:] = 0.0

    y = rowsharded_spmv_halo(
        mesh, hs, jnp.asarray(iz_p), jnp.asarray(cols_p), jnp.asarray(psi)
    )
    psi_ref = jnp.concatenate(
        [jnp.asarray(psi), jnp.zeros((1, 9, 4), jnp.complex128)], axis=0
    )
    y_ref = block_spmv(hs, jnp.asarray(iz_p), jnp.asarray(cols_p), psi_ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-12)


def test_lanczos_rowsharded_matches_unsharded(small_system):
    from rslmtoasa_tpu.ops.lanczos import (
        lanczos_coefficients,
        scalar_start_vectors,
    )
    from rslmtoasa_tpu.parallel.mesh import lanczos_rowsharded, make_mesh

    hb = small_system
    mesh = make_mesh(8)
    n_shards = 8
    kk_pad, iz_p, cols_p = _padded_rows(hb, n_shards)
    hs = jnp.asarray(hb.ee[:, :, :9, :9])
    lld = 6

    psi0_full = np.asarray(scalar_start_vectors(hb.kk, [0]))  # (kk+1, 9, 9)
    psi0 = np.zeros((kk_pad, 9, 9), np.complex128)
    psi0[:hb.kk] = psi0_full[:-1]

    a_s, b2_s = lanczos_rowsharded(
        mesh, hs, jnp.asarray(iz_p), jnp.asarray(cols_p),
        jnp.asarray(psi0), lld
    )
    a_r, b2_r = lanczos_coefficients(
        hs, jnp.asarray(hb.iz), jnp.asarray(hb.cols),
        jnp.asarray(psi0_full), lld
    )
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(b2_s), np.asarray(b2_r), atol=1e-10)


def test_total_dos_psum(small_system):
    from rslmtoasa_tpu.parallel.mesh import make_mesh, total_dos_psum

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    dens = rng.standard_normal((32, 16))
    dtot = total_dos_psum(mesh, jnp.asarray(dens))
    np.testing.assert_allclose(np.asarray(dtot), dens.sum(axis=1),
                               atol=1e-12)
