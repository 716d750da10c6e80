#!/usr/bin/env python3
"""TPU device-path self-test: run the production device engines on the
real accelerator and gate them against the CPU complex128 reference in
the same process.

Covers the three production device paths (VERDICT r1 weak-point #1: the
test suite forces CPU, so the TPU code paths were only parity-tested via
their CPU images):

1. block-Lanczos SCF step engine  (block_lanczos_split, +-HoH)
2. exchange pair chains           (4-start-vector block recursion)
3. Kubo two-sided moment block    (kubo_moments, realified f32 with
   Precision.HIGHEST — the no-stencil fallback; plus the df64
   ms-conv production engine, ops/kubo_ms.py, gated at 1e-8)
4. conv-stencil df64 scalar Lanczos (the bench engine)
5. fused Pallas flat-stencil df64 scalar Lanczos
6. multi-site df64 conv engines   (ms-conv block-Lanczos + Chebyshev,
   the SCF production path, bcc+HoH and B2 cells)

Run from the repo root on a machine with the TPU visible:

    python tools/tpu_selftest.py

Exit code 0 = all device results match CPU f64 within the stated
tolerances (realified-f64 engines: 1e-8; df64 conv engine: 1e-8;
realified-f32 Kubo: 2e-4 relative to the moment scale, the KPM noise
floor far below the Lorentz-kernel broadening).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    if jax.default_backend() == "cpu":
        print("no accelerator visible; selftest requires a TPU backend")
        return 1
    cpu = jax.devices("cpu")[0]

    from rslmtoasa_tpu.models.presets import build_synthetic_bcc
    from rslmtoasa_tpu.ops.block_lanczos import (
        block_lanczos,
        block_lanczos_split,
        block_start_vectors,
    )

    sys_ = build_synthetic_bcc(rc=16.0, ndim=4000, lld=8, nsp=2)
    hb = sys_.ham
    kk = sys_.cluster.kk
    lld = 8
    ntype = hb.ee.shape[0]
    lsham = hb.lsham if hb.lsham is not None else np.zeros(
        (ntype, 18, 18), np.complex128)
    ok = True

    def check(name, dev, ref, tol):
        nonlocal ok
        err = np.max(np.abs(np.asarray(dev) - np.asarray(ref)))
        good = err < tol
        ok = ok and good
        print(f"{name:34s} max|dev-cpu| = {err:9.2e}  "
              f"({'OK' if good else 'FAIL'} @ {tol:g})")

    # ---- 1. block recursion (SCF step engine) -------------------------
    psi0 = block_start_vectors(kk, [0])
    a_dev, b_dev = block_lanczos_split(hb.ee, lsham, hb.iz, hb.cols,
                                       psi0, lld)
    with jax.default_device(cpu):
        a_ref, b_ref = block_lanczos(
            jnp.asarray(hb.ee), jnp.asarray(lsham), jnp.asarray(hb.iz),
            jnp.asarray(hb.cols), jnp.asarray(psi0), lld)
    check("block_lanczos (TPU realified)", a_dev, a_ref, 1e-8)
    check("block_lanczos B^2", b_dev, b_ref, 1e-8)

    # ---- 2. exchange pair chains --------------------------------------
    from rslmtoasa_tpu.models.exchange import pair_start_vectors

    psi_p = pair_start_vectors(kk, np.array([[1, 2]]))
    ap_dev, bp_dev = block_lanczos_split(hb.ee, lsham, hb.iz, hb.cols,
                                         psi_p, lld)
    with jax.default_device(cpu):
        ap_ref, bp_ref = block_lanczos(
            jnp.asarray(hb.ee), jnp.asarray(lsham), jnp.asarray(hb.iz),
            jnp.asarray(hb.cols), jnp.asarray(psi_p), lld)
    check("exchange pair chains (TPU)", ap_dev, ap_ref, 1e-8)

    # ---- 3. Kubo moment block (realified f32 on device) ---------------
    from rslmtoasa_tpu.models.conductivity import build_velocity_operators
    from rslmtoasa_tpu.ops.block_lanczos import (
        realify_blocks,
        unrealify_blocks,
    )
    from rslmtoasa_tpu.ops.kubo import kubo_moments

    v_a, v_b, _, _ = build_velocity_operators(
        sys_, np.array([0.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
    n_mom = 16
    psiref = np.zeros((kk, 36, 36), np.float32)
    psiref[0] = np.eye(36)
    mu_dev = np.asarray(kubo_moments(
        jnp.asarray(realify_blocks(hb.ee), jnp.float32),
        jnp.asarray(realify_blocks(lsham), jnp.float32),
        jnp.asarray(hb.iz), jnp.asarray(hb.cols),
        jnp.asarray(realify_blocks(v_a), jnp.float32),
        jnp.asarray(realify_blocks(v_b), jnp.float32),
        jnp.asarray(psiref), n_moments=n_mom, block_size=8,
        a=1.3, b=-0.2, highest=True))
    mu_dev = unrealify_blocks(mu_dev)
    psic = np.zeros((kk, 18, 18), np.complex128)
    psic[0] = np.eye(18)
    with jax.default_device(cpu):
        mu_ref = unrealify_blocks(np.asarray(kubo_moments(
            jnp.asarray(realify_blocks(hb.ee)),
            jnp.asarray(realify_blocks(lsham)),
            jnp.asarray(hb.iz), jnp.asarray(hb.cols),
            jnp.asarray(realify_blocks(v_a)),
            jnp.asarray(realify_blocks(v_b)),
            jnp.asarray(realify_blocks(psic)),
            n_moments=n_mom, block_size=8, a=1.3, b=-0.2)))
    scale = np.abs(mu_ref).max()
    check("kubo moments (TPU f32 vs CPU f64)", mu_dev / scale,
          mu_ref / scale, 2e-4)

    # ---- 3b. df64 ms-conv Kubo (the production conductivity path) -----
    from rslmtoasa_tpu.ops.kubo_ms import MSKubo
    from rslmtoasa_tpu.ops.msconv import MSEngine, build_ms_stencil

    eng = MSEngine(build_ms_stencil(sys_.cluster), hb.ee, lsham)
    mk = MSKubo(eng, v_a, v_b, np.zeros_like(v_a), np.zeros_like(v_b))
    mu_ms = mk.moments(psic, n_mom, 1.3, -0.2)
    check("kubo moments (TPU df64 conv)", mu_ms / scale, mu_ref / scale,
          1e-8)

    # ---- 4. conv-stencil df64 Lanczos (bench engine) -------------------
    from rslmtoasa_tpu.ops.lanczos import (
        lanczos_coefficients,
        scalar_start_vectors,
        split_complex,
    )
    from rslmtoasa_tpu.ops.stencil_conv import (
        build_conv_stencil,
        conv_start_vectors,
        lanczos_coefficients_conv_df64,
        pack_conv_kernel_df64,
    )

    st = build_conv_stencil(sys_.cluster)
    blk = hb.ee[:, :, :9, :9]
    w, h_scale, radius = pack_conv_kernel_df64(
        np.asarray(split_complex(blk[0])), st.dcells)
    psi_c = conv_start_vectors(st, [0], 18, orbitals=range(9))
    a_conv, b2_conv = lanczos_coefficients_conv_df64(
        w, h_scale, st.mask, psi_c, lld, radius=radius)
    with jax.default_device(cpu):
        a_cref, b2_cref = lanczos_coefficients(
            jnp.asarray(blk), jnp.asarray(hb.iz), jnp.asarray(hb.cols),
            jnp.asarray(scalar_start_vectors(kk, [0])), lld)
    check("conv df64 lanczos (TPU)", a_conv, np.asarray(a_cref), 1e-8)
    check("conv df64 b2", b2_conv, np.asarray(b2_cref), 1e-8)

    # ---- 5. fused Pallas flat-stencil df64 (the production engine) -----
    from rslmtoasa_tpu.ops import pallas_conv as pc

    fs = pc.build_flat_stencil(st)
    wt, hsc, dxs, colshifts = pc.pack_flat_kernel(
        np.asarray(split_complex(blk[0])), st)
    p0 = pc.flat_start_vectors(fs, [0], 18, orbitals=range(9))
    a_pl, b2_pl = pc.lanczos_coefficients_flat_df64(
        wt, hsc, fs.mask, p0, lld, dxs=dxs, colshifts=colshifts)
    check("pallas df64 lanczos (TPU)", a_pl, np.asarray(a_cref), 1e-8)
    check("pallas df64 b2", b2_pl, np.asarray(b2_cref), 1e-8)

    # ---- 6. multi-site df64 conv engines (the SCF production path) ----
    from rslmtoasa_tpu.models.presets import build_synthetic_b2
    from rslmtoasa_tpu.ops.chebyshev import chebyshev_moments
    from rslmtoasa_tpu.ops.msconv import MSEngine, build_ms_stencil

    for label, sysm, hoh in (
            ("bcc hoh", build_synthetic_bcc(rc=16.0, ndim=4000, lld=8,
                                            nsp=2, hoh=True), True),
            ("b2", build_synthetic_b2(rc=12.0, ndim=4000, lld=8,
                                      nsp=2), False)):
        hbm = sysm.ham
        clm = sysm.cluster
        lsm = hbm.lsham
        psim = block_start_vectors(clm.kk, [0])
        eng = MSEngine(build_ms_stencil(clm), hbm.ee, lsm, hoh=hoh,
                       hso=hbm.eeo if hoh else None,
                       enim=hbm.enim if hoh else None)
        g = eng.embed(psim)
        a_ms, b_ms = eng.block_lanczos(g, lld)
        mu_ms = eng.chebyshev_moments(g, lld, 1.9, -0.2)
        with jax.default_device(cpu):
            a_mr, b_mr = block_lanczos(
                jnp.asarray(hbm.ee), jnp.asarray(lsm), jnp.asarray(hbm.iz),
                jnp.asarray(hbm.cols), jnp.asarray(psim), lld, hoh=hoh,
                hso=jnp.asarray(hbm.eeo) if hoh else None,
                enim=jnp.asarray(hbm.enim) if hoh else None)
            mu_mr = chebyshev_moments(
                jnp.asarray(hbm.ee), jnp.asarray(lsm), jnp.asarray(hbm.iz),
                jnp.asarray(hbm.cols), jnp.asarray(psim), lld, 1.9, -0.2,
                hoh=hoh, hso=jnp.asarray(hbm.eeo) if hoh else None,
                enim=jnp.asarray(hbm.enim) if hoh else None)
        check(f"ms-conv block ({label}, TPU)", a_ms, np.asarray(a_mr), 1e-8)
        check(f"ms-conv block B^2 ({label})", b_ms, np.asarray(b_mr), 1e-8)
        check(f"ms-conv chebyshev ({label})", mu_ms, np.asarray(mu_mr),
              1e-8)

    print("TPU selftest:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
