#!/usr/bin/env python3
"""AOT memory/compile/runtime measurement of the dense block stage at
several chain-batch sizes, with and without buffer donation — calibrates
the _chain_batch bytes model (VERDICT r4 item 5).

Usage: python tools/profile_batch.py [rb ...]   (repo root, TPU)
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
    rbs = [int(a) for a in sys.argv[1:]] or [4, 8]
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
    lsham = np.zeros((hb.ee.shape[0], 18, 18), dtype=np.complex128)
    eng = _ms_engine_for(cl, hb.ee, lsham, False, None, None)
    psi0 = pair_start_vectors(cl.kk, np.asarray(cfg.lattice.ijpair))
    p0 = eng.embed(psi0)
    d = eng.d
    mask_sub, loc, gco, sdims, ent = eng._stage_tables(eng.full_bbox)
    args = (jnp.float32(eng.scale), jnp.float32(eng.scale_o),
            jnp.float32(eng.scale_ons))

    # donated variant of the stage: psi/pmn pairs are dead after the call
    stage = jax.jit(
        M._block_stage_ms_jit.__wrapped__,
        static_argnames=("nsteps", "hoh", "radius", "groups", "dims", "d",
                         "unroll"),
        donate_argnums=(6, 7),
    )

    for rb in rbs:
        reps = max(1, 8 // rb)
        flat = np.asarray(p0[:1]).repeat(rb, 0).reshape(
            (rb * d,) + p0.shape[2:])
        sub = jnp.asarray(flat[..., np.asarray(ent["idx"])])
        sum_b = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float64),
                                 (rb, d, d))
        t0 = time.perf_counter()
        try:
            lowered = stage.lower(
                eng.w, eng.w_o, eng.w_ons, loc, gco, mask_sub,
                (sub, jnp.zeros_like(sub)),
                (jnp.zeros_like(sub), jnp.zeros_like(sub)),
                sum_b, *args, nsteps=lld - 1, hoh=False,
                radius=eng.radius, groups=eng.groups, dims=sdims, d=d,
                unroll=1)
            t1 = time.perf_counter()
            compiled = lowered.compile()
            t2 = time.perf_counter()
        except Exception as e:
            print(f"rb={rb}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")
            continue
        mem = compiled.memory_analysis()
        tmp = getattr(mem, "temp_size_in_bytes", None)
        print(f"rb={rb}: trace {t1-t0:.1f} s, compile {t2-t1:.1f} s, "
              f"temp {tmp/2**30 if tmp else -1:.2f} GiB")
        try:
            # chained calls: feed advanced state back in (donation-safe,
            # and exactly the multi-stage usage pattern)
            psi = (sub, jnp.zeros_like(sub))
            pmn = (jnp.zeros_like(sub), jnp.zeros_like(sub))
            outs = compiled(eng.w, eng.w_o, eng.w_ons, loc, gco,
                            mask_sub, psi, pmn, sum_b, *args)
            np.asarray(outs[3][0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(2):
                outs = compiled(eng.w, eng.w_o, eng.w_ons, loc, gco,
                                mask_sub, outs[0], outs[1], outs[2],
                                *args)
                np.asarray(outs[3][0, 0, 0])
            dt = (time.perf_counter() - t0) / 2
            print(f"rb={rb}: run {dt:.2f} s ({dt/(lld-1)*1e3:.0f} ms/step;"
                  f" {reps} batch(es) for r=8 -> {dt*reps:.2f} s)")
        except Exception as e:
            print(f"rb={rb}: RUN FAIL {type(e).__name__}: {str(e)[:160]}")

    shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
