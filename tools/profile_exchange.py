#!/usr/bin/env python3
"""Per-stage device profile of the exchange pair recursion (VERDICT r4
weak #4 / item 5: bccFe jij device wall is ~8x the same-cluster SCF).

Builds the Example_exchange_bccFe case exactly as the CLI does, then
times the ms-conv block-Lanczos engine end-to-end and piece by piece
(conv, chunk extraction, Gram, eigh/sqrt, column transforms) so the
4.5 s/step gap vs the conv's own rate is attributable.

Usage: python tools/profile_exchange.py [hoh]   (repo root, TPU)
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def t_read(fn, *args, reps=3, small=True, **kw):
    """Time fn with a host readback barrier (axon block_until_ready is
    a no-op); returns (dt_seconds, result)."""
    out = fn(*args, **kw)
    o = out[0] if isinstance(out, tuple) else out
    np.asarray(o if small else o[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        o = out[0] if isinstance(out, tuple) else out
        np.asarray(o if small else o[:1])
    return (time.perf_counter() - t0) / reps, out


def main():
    hoh = len(sys.argv) > 1 and sys.argv[1] == "hoh"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rslmtoasa_tpu.config import JobConfig
    from rslmtoasa_tpu.models.bulk import BulkSystem
    from rslmtoasa_tpu.models.exchange import pair_start_vectors
    from rslmtoasa_tpu.parallel.dispatch import _ms_engine_for
    from rslmtoasa_tpu.models.scf import ANG2AU

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
    cfg.hamiltonian.hoh = hoh

    t0 = time.perf_counter()
    sys_ = BulkSystem.build(cfg, wd)
    sys_.build_hamiltonian()
    for at in sys_.atoms:
        at.potential.predls(sys_.cluster.wav * ANG2AU)
    print(f"# build: {time.perf_counter()-t0:.1f} s; kk={sys_.cluster.kk}")

    hb = sys_.ham
    cl = sys_.cluster
    lld = cfg.control.lld
    ntype = hb.ee.shape[0]
    lsham = hb.lsham if hb.lsham is not None else np.zeros(
        (ntype, 18, 18), dtype=np.complex128)
    psi0 = pair_start_vectors(cl.kk, np.asarray(cfg.lattice.ijpair))
    r = psi0.shape[0]

    t0 = time.perf_counter()
    eng = _ms_engine_for(cl, hb.ee, lsham, hoh,
                         hb.eeo if hoh else None,
                         hb.enim if hoh else None)
    print(f"# engine pack: {time.perf_counter()-t0:.1f} s; "
          f"dims={eng.st.dims} ncells={int(np.prod(eng.st.dims))} "
          f"ntot={eng.st.ntot} grid_shard={getattr(eng, '_grid_shard', 0)}")

    p0 = eng.embed(psi0)
    bbox = eng.start_bbox(psi0)
    plan = eng.stage_plan(bbox, lld - 1, first_ball=1)
    if plan is None:
        plan = [(lld - 1, eng.full_bbox)]
    print(f"# chain batch: {eng._chain_batch(r)} of r={r}")
    print("# stage plan:", [(n, tuple(int(h - l + 1) for l, h in
                                      zip(b[0], b[1]))) for n, b in plan])

    # ---- end-to-end (dispatch = production path, incl. spin split) -
    from rslmtoasa_tpu.parallel.dispatch import block_lanczos_auto

    t0 = time.perf_counter()
    a_a, b2_a = block_lanczos_auto(hb.ee, lsham, hb.iz, hb.cols, psi0,
                                   lld, hoh=hoh,
                                   hso=hb.eeo if hoh else None,
                                   enim=hb.enim if hoh else None,
                                   cluster=cl)
    print(f"# auto cold: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    a_a, b2_a = block_lanczos_auto(hb.ee, lsham, hb.iz, hb.cols, psi0,
                                   lld, hoh=hoh,
                                   hso=hb.eeo if hoh else None,
                                   enim=hb.enim if hoh else None,
                                   cluster=cl)
    print(f"# auto warm: {time.perf_counter()-t0:.2f} s")

    # ---- end-to-end (engine direct, no split) ---------------------
    t0 = time.perf_counter()
    a_b, b2_b = eng.block_lanczos(p0, lld, start_bbox=bbox)
    print(f"# block_lanczos cold: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    a_b, b2_b = eng.block_lanczos(p0, lld, start_bbox=bbox)
    dt_full = time.perf_counter() - t0
    print(f"# block_lanczos warm: {dt_full:.2f} s "
          f"({dt_full/(lld-1)*1e3:.0f} ms/step)")
    from rslmtoasa_tpu.ops.block_lanczos import unrealify_blocks as _unr

    err = max(np.abs(np.asarray(a_a) - np.asarray(a_b)).max(),
              np.abs(np.asarray(b2_a) - np.asarray(b2_b)).max())
    print(f"# split-vs-unsplit maxdiff: {err:.3e}")

    # ---- dense single stage at the production batch size ----------
    from rslmtoasa_tpu.ops import msconv as M

    d = eng.d
    rb = eng._chain_batch(r)
    r = rb  # pieces below run one production batch
    flat = p0[:rb].reshape((rb * d,) + p0.shape[2:])
    mask_sub, loc, gco, sdims, ent = eng._stage_tables(eng.full_bbox)
    sub = flat[..., ent["idx"]]
    psi = (sub, jnp.zeros_like(sub))
    pmn = (jnp.zeros_like(sub), jnp.zeros_like(sub))
    sum_b = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float64), (rb, d, d))
    args = (jnp.float32(eng.scale), jnp.float32(eng.scale_o),
            jnp.float32(eng.scale_ons))
    nd = psi[0].shape[1]
    print(f"# batch state: (rb*d={rb*d}, nd={nd}, ncells={psi[0].shape[2]}) "
          f"f32 pair = {2*psi[0].size*4/1e9:.2f} GB")

    def full_stage():
        return M._block_stage_ms_jit(
            eng.w, eng.w_o, eng.w_ons, loc, gco, mask_sub, psi, pmn,
            sum_b, *args, lld - 1, eng.hoh, eng.radius, eng.groups,
            sdims, d, 1)[3]

    dt, _ = t_read(full_stage, reps=1)
    dt, _ = t_read(full_stage, reps=2)
    print(f"# dense stage rb={rb} ({lld-1} steps): {dt:.2f} s "
          f"({dt/(lld-1)*1e3:.0f} ms/step)")

    # ---- pieces ---------------------------------------------------
    import functools

    apply_h = functools.partial(
        M._apply_h_chunks, eng.w, eng.w_o, eng.w_ons, loc, gco, mask_sub,
        *args, eng.radius, eng.groups, sdims, eng.hoh)

    @jax.jit
    def conv_only(psi):
        xq, fx = M.extract_scaled(psi)
        h = apply_h(xq, fx, x_pair=psi)
        return h[0].sum()

    dt, _ = t_read(conv_only, psi)
    print(f"# extract+conv: {dt*1e3:.0f} ms")

    @jax.jit
    def extract_only(psi):
        xq, fx = M.extract_scaled(psi)
        return xq.sum() + fx.sum()

    dt, _ = t_read(extract_only, psi)
    print(f"# extract alone: {dt*1e3:.0f} ms")

    @jax.jit
    def gram_only(psi):
        xq, fx = M.extract_scaled(psi)
        g = M.gram_chunks(xq, fx, xq, fx, r, d, nd)
        return g[0].sum()

    dt, _ = t_read(gram_only, psi)
    print(f"# extract+gram: {dt*1e3:.0f} ms")

    from rslmtoasa_tpu.ops.block_lanczos import _eig_sqrt

    rng = np.random.default_rng(0)
    amat = rng.standard_normal((rb, d, d))
    b2_64 = jnp.asarray(amat @ amat.transpose(0, 2, 1)
                        + 0.1 * np.eye(d), jnp.float64)

    @jax.jit
    def eig_loop(b2):
        def body(c, _):
            b, bi = _eig_sqrt(c)
            return b, bi[0, 0, 0]

        out, o = jax.lax.scan(body, b2, None, length=lld - 1)
        return o.sum()

    dt, _ = t_read(eig_loop, b2_64)
    print(f"# eigh+refine x{lld-1}: {dt:.2f} s "
          f"({dt/(lld-1)*1e3:.0f} ms/step)")

    @jax.jit
    def colmul_only(psi, b2):
        xq, fx = M.extract_scaled(psi)
        aq, fa = M.extract_small((b2.astype(jnp.float32),
                                  jnp.zeros_like(b2, jnp.float32)))
        t = M.colmul_chunks(xq, fx, aq, fa, r, d)
        return t[0].sum()

    dt, _ = t_read(colmul_only, psi, b2_64)
    print(f"# extract+colmul: {dt*1e3:.0f} ms")

    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
