#!/usr/bin/env python3
"""Device wavefront benchmark at production cluster size (VERDICT r2 #4):
dense vs wavefront-staged ms-conv block recursion at kk ~ 1e5 on the TPU,
with exact parity between the two.

Usage: python tools/bench_wavefront_ms.py [rc] [lld]   (repo root, TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rc = float(sys.argv[1]) if len(sys.argv) > 1 else 62.0
    lld = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from rslmtoasa_tpu.models.presets import build_synthetic_bcc
    from rslmtoasa_tpu.ops.block_lanczos import block_start_vectors
    from rslmtoasa_tpu.ops.msconv import MSEngine, build_ms_stencil

    # build_synthetic_bcc's bravais_cluster caps the sphere at
    # 0.8*npe/2 (the reference's rs guard); raise npe for large rc
    import rslmtoasa_tpu.geometry as G

    sys_ = build_synthetic_bcc(rc=4.0, ndim=4000, lld=lld, nsp=2)
    cell = sys_.cluster.cell
    # rc is r^2 in alat units (reference bravais convention); npe must
    # not cap the sphere: 0.8*npe/2 >= sqrt(rc)
    cl = G.bravais_cluster(cell, alat=sys_.cfg.lattice.alat, rc=rc,
                           ndim=4000000,
                           npe=int(2.0 * np.sqrt(rc) / 0.8) + 6,
                           wav=sys_.cfg.lattice.wav)
    G.neighbor_map(cl, ct1=3.0)
    sys_.cluster = cl
    sys_.sbars, sys_.sbarvecs = G.sbar_for_cluster(
        cl.cr_ang, cl.iu, cl.wav, 9.0)
    sys_.ham = None
    sys_.build_hamiltonian()
    hb = sys_.ham
    st = build_ms_stencil(cl)
    print(f"# kk={cl.kk} dims={st.dims} lld={lld}", file=sys.stderr)
    eng = MSEngine(st, hb.ee, hb.lsham)
    psi0 = block_start_vectors(cl.kk, [int(cl.irec[0]) - 1])
    g = eng.embed(psi0)
    bbox = eng.start_bbox(psi0)
    plan = eng.stage_plan(bbox, lld - 1, first_ball=1)
    print(f"# plan: {[(n, tuple(np.subtract(b[1], b[0]))) for n, b in (plan or [])]}",
          file=sys.stderr)

    def run(staged):
        t0 = time.time()
        a_b, b2_b = eng.block_lanczos(g, lld,
                                      start_bbox=bbox if staged else None)
        return time.time() - t0, np.asarray(a_b), np.asarray(b2_b)

    run(True)  # compile
    t_st, a_st, b_st = run(True)
    try:
        run(False)  # compile
        t_dn, a_dn, b_dn = run(False)
        err = max(np.abs(a_st - a_dn).max(), np.abs(b_st - b_dn).max())
        print(json.dumps({
            "metric": "wavefront_block_speedup", "kk": cl.kk, "lld": lld,
            "dense_s": round(t_dn, 2), "staged_s": round(t_st, 2),
            "speedup": round(t_dn / t_st, 2), "parity": float(err)}))
    except Exception as e:  # dense path OOMs first at large kk
        print(json.dumps({
            "metric": "wavefront_block_speedup", "kk": cl.kk, "lld": lld,
            "dense_s": None, "staged_s": round(t_st, 2),
            "note": f"dense failed: {type(e).__name__}"}))


if __name__ == "__main__":
    main()
