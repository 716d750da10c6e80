#!/usr/bin/env python3
"""Wavefront (active-set) vs dense recursion at large cluster sizes.

The reference's ``create_ll_map`` active-set maps exist to bound the
recursion cost on its production clusters (1e5-1e6 atoms,
recursion.f90:3277-3303).  This tool measures the TPU-native staged
equivalent (ops/wavefront.py) against the dense engine on a synthetic
bcc cluster, scalar 9-orbital chains on one start atom.

Usage: python tools/bench_wavefront.py [rc] [lld]   (default rc=520 ->
~59k atoms; rc=1200 -> ~2e5).  Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rslmtoasa_tpu.geometry import (
        bravais_cluster,
        neighbor_map,
        primitive_cell,
    )
    from rslmtoasa_tpu.ops.lanczos import (
        lanczos_coefficients,
        lanczos_coefficients_split,
        scalar_start_vectors,
        split_complex,
        split_vector,
    )
    from rslmtoasa_tpu.ops.wavefront import (
        lanczos_coefficients_wavefront,
        make_plan,
    )

    rc = float(sys.argv[1]) if len(sys.argv) > 1 else 520.0
    lld = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cell = primitive_cell("bcc")
    npe = max(49, 2 * int(np.ceil(np.sqrt(rc) / 0.8)) + 3)
    cl = bravais_cluster(cell, alat=2.8612, rc=rc, ndim=5000000,
                         npe=npe, wav=1.4088)
    neighbor_map(cl, ct1=3.0)
    kk = cl.kk
    nslots = cl.nn.shape[1] + 1
    cols = np.full((kk, nslots), kk, dtype=np.int32)
    cols[:, 0] = np.arange(kk, dtype=np.int32)
    cols[:, 1:] = cl.nn.astype(np.int32)
    iz = np.zeros(kk, dtype=np.int32)

    # synthetic Hermitian slot blocks (canonical +/- slot pairing: find
    # the opposite-direction slot by matching dirs)
    rng = np.random.default_rng(11)
    hs = 0.1 * (rng.standard_normal((1, nslots, 9, 9))
                + 1j * rng.standard_normal((1, nslots, 9, 9)))
    hs[0, 0] = hs[0, 0] + hs[0, 0].conj().T  # onsite Hermitian
    dirs = np.asarray(cl.dirs)[0]  # (nslots-1, 3) canonical directions
    for m in range(1, nslots):
        for m2 in range(m, nslots):
            if np.allclose(dirs[m - 1], -dirs[m2 - 1]):
                hs[0, m2] = hs[0, m].conj().T
                break

    start = int(cl.iu[0]) - 1
    psi0 = scalar_start_vectors(kk, [start])
    plan = make_plan(cols, kk, [start], lld)
    use_split = jax.default_backend() != "cpu"

    def run_dense():
        if use_split:
            return lanczos_coefficients_split(
                split_complex(hs), jnp.asarray(iz), jnp.asarray(cols),
                split_vector(psi0), lld)
        return lanczos_coefficients(
            jnp.asarray(hs), jnp.asarray(iz), jnp.asarray(cols),
            jnp.asarray(psi0), lld)

    def run_wf():
        if use_split:
            hs_s = np.asarray(split_complex(hs))
            psi_s = np.asarray(split_vector(psi0))
            return lanczos_coefficients_wavefront(
                hs_s, iz, cols, psi_s, lld, plan)
        return lanczos_coefficients_wavefront(
            np.asarray(hs), iz, cols, np.asarray(psi0), lld, plan)

    # warm + time
    a_d, b_d = run_dense()
    a_d = np.asarray(a_d)
    t0 = time.perf_counter()
    a_d, b_d = run_dense()
    a_d, b_d = np.asarray(a_d), np.asarray(b_d)
    t_dense = time.perf_counter() - t0

    a_w, b_w = run_wf()
    t0 = time.perf_counter()
    a_w, b_w = run_wf()
    t_wf = time.perf_counter() - t0

    err = max(np.abs(a_w - a_d).max(), np.abs(b_w - b_d).max())
    assert err < 1e-8, f"wavefront mismatch {err}"
    print(f"# kk={kk} lld={lld} stages={plan.stages}", file=sys.stderr)
    print(f"# dense {t_dense*1e3:.0f} ms, wavefront {t_wf*1e3:.0f} ms, "
          f"plan work ratio {plan.work/plan.dense_work:.3f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "wavefront_speedup",
        "value": round(t_dense / t_wf, 3),
        "unit": "x vs dense",
        "kk": kk,
        "work_ratio": round(plan.work / plan.dense_work, 4),
        "max_err": float(err),
    }))


if __name__ == "__main__":
    main()
