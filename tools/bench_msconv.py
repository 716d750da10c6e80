#!/usr/bin/env python3
"""Device benchmark: multi-site df64 conv engines vs the emulated-f64
gather engines for block-Lanczos and Chebyshev (the round-2 VERDICT #1
gate: >= 5x at <= 1e-8 vs CPU f64).

Run from the repo root on the TPU host:  python tools/bench_msconv.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    rc = float(sys.argv[1]) if len(sys.argv) > 1 else 18.0

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rslmtoasa_tpu.models.presets import build_synthetic_b2, build_synthetic_bcc
    from rslmtoasa_tpu.ops.block_lanczos import (
        block_lanczos,
        block_lanczos_split,
        block_start_vectors,
    )
    from rslmtoasa_tpu.ops.chebyshev import chebyshev_moments_split
    from rslmtoasa_tpu.ops.msconv import MSEngine, build_ms_stencil

    cpu = jax.local_devices(backend="cpu")[0]
    lld = 20
    for name, builder, hoh in (("bccFe-like", build_synthetic_bcc, True),
                               ("B2-like", build_synthetic_b2, False)):
        sys_ = builder(rc=rc, ndim=300000, lld=lld, nsp=2, hoh=hoh)
        cl, hb = sys_.cluster, sys_.ham
        lsham = hb.lsham
        rec = [int(j) - 1 for j in cl.irec]
        psi0 = block_start_vectors(cl.kk, rec)
        print(f"# {name}: kk={cl.kk} ntot={cl.cell.ntot} lld={lld} "
              f"hoh={hoh} chains={len(rec)}", file=sys.stderr)

        # CPU f64 truth
        with jax.default_device(cpu):
            a_ref, b_ref = block_lanczos(
                jnp.asarray(hb.ee), jnp.asarray(lsham),
                jnp.asarray(hb.iz), jnp.asarray(hb.cols),
                jnp.asarray(psi0), lld, hoh=hoh,
                hso=jnp.asarray(hb.eeo) if hoh else None,
                enim=jnp.asarray(hb.enim) if hoh else None)
            a_ref, b_ref = np.asarray(a_ref), np.asarray(b_ref)

        # emulated-f64 gather engine (the round-2 device path)
        def run_emu():
            a, b = block_lanczos_split(
                hb.ee, lsham, hb.iz, hb.cols, psi0, lld, hoh=hoh,
                hso=hb.eeo if hoh else None,
                enim=hb.enim if hoh else None)
            return np.asarray(a), np.asarray(b)

        a_emu, b_emu = run_emu()  # compile
        t0 = time.time()
        a_emu, b_emu = run_emu()
        t_emu = time.time() - t0

        # ms conv engine
        eng = MSEngine(build_ms_stencil(cl), hb.ee, lsham, hoh=hoh,
                       hso=hb.eeo if hoh else None,
                       enim=hb.enim if hoh else None)
        g = eng.embed(psi0)
        a_ms, b_ms = eng.block_lanczos(g, lld)  # compile
        t0 = time.time()
        eng2 = MSEngine(build_ms_stencil(cl), hb.ee, lsham, hoh=hoh,
                        hso=hb.eeo if hoh else None,
                        enim=hb.enim if hoh else None)
        a_ms, b_ms = eng2.block_lanczos(eng2.embed(psi0), lld)
        t_ms = time.time() - t0

        err_emu = max(np.abs(a_emu - a_ref).max(), np.abs(b_emu - b_ref).max())
        err_ms = max(np.abs(a_ms - a_ref).max(), np.abs(b_ms - b_ref).max())
        print(f"block {name}: emu {t_emu:.2f}s (err {err_emu:.2e})  "
              f"ms {t_ms:.2f}s (err {err_ms:.2e})  "
              f"speedup {t_emu / t_ms:.1f}x")

        # chebyshev
        a_s, b_s = 1.9, -0.2

        def run_emu_ch():
            return chebyshev_moments_split(
                hb.ee, lsham, hb.iz, hb.cols, psi0, lld, a_s, b_s,
                hoh=hoh, hso=hb.eeo if hoh else None,
                enim=hb.enim if hoh else None)

        mu_emu = run_emu_ch()
        t0 = time.time()
        mu_emu = run_emu_ch()
        t_emu = time.time() - t0
        mu_ms = eng.chebyshev_moments(g, lld, a_s, b_s)
        t0 = time.time()
        mu_ms = eng2.chebyshev_moments(eng2.embed(psi0), lld, a_s, b_s)
        t_ms = time.time() - t0
        with jax.default_device(cpu):
            from rslmtoasa_tpu.ops.chebyshev import chebyshev_moments

            mu_ref = np.asarray(chebyshev_moments(
                jnp.asarray(hb.ee), jnp.asarray(lsham), jnp.asarray(hb.iz),
                jnp.asarray(hb.cols), jnp.asarray(psi0), lld, a_s, b_s,
                hoh=hoh, hso=jnp.asarray(hb.eeo) if hoh else None,
                enim=jnp.asarray(hb.enim) if hoh else None))
        err_emu = np.abs(mu_emu - mu_ref).max()
        err_ms = np.abs(mu_ms - mu_ref).max()
        print(f"cheb  {name}: emu {t_emu:.2f}s (err {err_emu:.2e})  "
              f"ms {t_ms:.2f}s (err {err_ms:.2e})  "
              f"speedup {t_emu / t_ms:.1f}x")


if __name__ == "__main__":
    main()
