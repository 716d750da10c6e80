#!/usr/bin/env python3
"""In-scan cost attribution for the ms block step: times scans of
successively larger prefixes of the step body (extract -> conv -> gram
-> colmul -> full), so per-piece costs exclude the per-call dispatch
overhead of the axon tunnel.

Usage: python tools/profile_step.py   (repo root, TPU)
"""

import os
import shutil
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rslmtoasa_tpu.config import JobConfig
    from rslmtoasa_tpu.models.bulk import BulkSystem
    from rslmtoasa_tpu.models.exchange import pair_start_vectors
    from rslmtoasa_tpu.models.scf import ANG2AU
    from rslmtoasa_tpu.parallel.dispatch import _ms_engine_for
    from rslmtoasa_tpu.ops import msconv as M
    from rslmtoasa_tpu.ops.block_lanczos import _eig_sqrt

    case_dir = "/root/reference/tests/postproc/cases/exchange/bccFe"
    wd = tempfile.mkdtemp(prefix="rslmto_prof_")
    for f in os.listdir(case_dir):
        shutil.copy(os.path.join(case_dir, f), wd)
    cfg = JobConfig.from_file(os.path.join(wd, "input.nml"))
    cfg.atoms.database = wd
    cfg.control.nsp = 2
    cfg.control.recur = "block"
    cfg.control.lld = 20
    cfg.scf.nstep = 1
    cfg.hamiltonian.hoh = False

    sys_ = BulkSystem.build(cfg, wd)
    sys_.build_hamiltonian()
    for at in sys_.atoms:
        at.potential.predls(sys_.cluster.wav * ANG2AU)
    hb = sys_.ham
    cl = sys_.cluster
    lld = cfg.control.lld
    sector = len(sys.argv) > 1 and sys.argv[1] == "sector"
    sl = slice(0, 9) if sector else slice(None)
    ee = np.ascontiguousarray(np.asarray(hb.ee)[..., sl, sl])
    lsham = np.zeros((ee.shape[0], ee.shape[-1], ee.shape[-1]),
                     dtype=np.complex128)
    eng = _ms_engine_for(cl, ee, lsham, False, None, None)
    psi0 = pair_start_vectors(cl.kk, np.asarray(cfg.lattice.ijpair))
    psi0 = np.ascontiguousarray(psi0[..., sl, sl])
    p0 = eng.embed(psi0)
    d = eng.d
    rb = eng._chain_batch(8)
    r = rb
    flat = np.asarray(p0[:rb]).reshape((rb * d,) + p0.shape[2:])
    mask_sub, loc, gco, sdims, ent = eng._stage_tables(eng.full_bbox)
    sub = jnp.asarray(flat[..., np.asarray(ent["idx"])])
    psi = (sub, jnp.zeros_like(sub))
    nd = psi[0].shape[1]
    args = (jnp.float32(eng.scale), jnp.float32(eng.scale_o),
            jnp.float32(eng.scale_ons))
    apply_h = partial(M._apply_h_chunks, eng.w, eng.w_o, eng.w_ons, loc,
                      gco, mask_sub, *args, eng.radius, eng.groups,
                      sdims, eng.hoh)
    print(f"# rb={rb} c={rb*d} nd={nd} ncells={psi[0].shape[2]}")

    nsteps = lld - 1

    def timed_scan(name, body):
        @jax.jit
        def run(psi):
            def step(carry, _):
                return body(carry), ()

            out, _ = jax.lax.scan(step, psi, None, length=nsteps)
            return out[0][0, 0], out[1][0, 0]

        o = run(psi)
        np.asarray(o[0])
        t0 = time.perf_counter()
        for _ in range(2):
            o = run(psi)
            np.asarray(o[0])
        dt = (time.perf_counter() - t0) / 2
        print(f"# scan {name}: {dt:.2f} s ({dt/nsteps*1e3:.0f} ms/step)")
        return dt

    # jitter-free bodies returning a pair shaped like psi
    def b_extract(p):
        xq, fx = M.extract_scaled(p)
        s = xq[:, :nd].astype(jnp.float32) * fx
        return (s, p[1])

    def b_conv(p):
        xq, fx = M.extract_scaled(p)
        return M.conv_chunks(eng.w, xq, fx, args[0], mask_sub,
                             eng.radius, eng.groups, sdims)

    def b_conv2(p):
        xq, fx = M.extract_scaled(p)
        h = M.conv_chunks(eng.w, xq, fx, args[0], mask_sub,
                          eng.radius, eng.groups, sdims)
        hq, fh = M.extract_scaled(h)
        return (hq[:, :nd].astype(jnp.float32) * fh, h[1])

    def b_gram(p):
        xq, fx = M.extract_scaled(p)
        g = M.gram_chunks(xq, fx, xq, fx, r, d, nd)
        return (p[0] + g[0].sum() * 1e-30, p[1])

    def b_colmul(p):
        xq, fx = M.extract_scaled(p)
        g = M.gram_chunks(xq, fx, xq, fx, r, d, nd)
        aq, fa = M.extract_small(g)
        t = M.colmul_chunks(xq, fx, aq, fa, r, d)
        return t

    def b_eig(p):
        xq, fx = M.extract_scaled(p)
        g = M.gram_chunks(xq, fx, xq, fx, r, d, nd)
        b, bi = _eig_sqrt(M._pair_f64(g)
                          + jnp.eye(d, dtype=jnp.float64) * 10.0)
        return (p[0] + b[0, 0, 0].astype(jnp.float32) * 1e-30, p[1])

    timed_scan("extract", b_extract)
    timed_scan("extract+conv", b_conv)
    timed_scan("extract+conv+extract", b_conv2)
    timed_scan("extract+gram", b_gram)
    timed_scan("extract+gram+eig", b_eig)
    timed_scan("extract+gram+colmul", b_colmul)

    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
