#!/usr/bin/env python3
"""Benchmark: block-ELL recursion SpMV throughput on the flagship workload.

Runs the batched Haydock recursion (the hot kernel of every calculation in
the framework) on the bcc synthetic cluster and reports sustained block-SpMV
throughput in Gnnz/s (nonzero Hamiltonian matrix entries processed per
second across all chains and recursion steps), compared against a
single-core NumPy baseline of the identical computation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rslmtoasa_tpu.models.presets import build_synthetic_bcc
    from rslmtoasa_tpu.ops.lanczos import (
        lanczos_coefficients_split,
        scalar_start_vectors,
        split_complex,
    )

    lld = 20
    sys_ = build_synthetic_bcc(rc=50.0, ndim=10000, lld=lld)
    hb = sys_.ham
    kk = hb.kk
    nslots = hb.nslots
    print(f"# cluster kk={kk} nslots={nslots} lld={lld}", file=sys.stderr)

    # both spin channels, 2 x 9 orbital chains per start atom; batch chains.
    # split-complex f64 representation (TPU v5e has no native C128).
    hs_np = hb.ee[:, :, :9, :9]
    hs = split_complex(jnp.asarray(hs_np))
    iz = jnp.asarray(hb.iz)
    cols = jnp.asarray(hb.cols)
    psi0 = split_complex(scalar_start_vectors(kk, [0]))
    c = psi0.shape[3]

    fn = jax.jit(
        lambda h, i, co, p: lanczos_coefficients_split(h, i, co, p, lld)
    )
    # warmup/compile
    t0 = time.perf_counter()
    a, b2 = fn(hs, iz, cols, psi0)
    a.block_until_ready()
    print(f"# compile+first run: {time.perf_counter()-t0:.1f} s",
          file=sys.stderr)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        a, b2 = fn(hs, iz, cols, psi0)
    a.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    # nnz = Hamiltonian block entries touched per SpMV (9x9 per slot),
    # processed once per chain per recursion step
    nnz = kk * nslots * 81
    work = nnz * c * (lld - 1)
    gnnz = work / dt / 1e9
    print(f"# device recursion: {dt*1e3:.1f} ms -> {gnnz:.3f} Gnnz/s",
          file=sys.stderr)

    # ---- NumPy single-core baseline of the identical computation -----
    iz_np = np.asarray(hb.iz)
    cols_np = np.asarray(hb.cols)
    psi_np = np.asarray(psi0)
    hi = hs_np[iz_np]  # (kk, nslots, 9, 9)

    def np_step(psi):
        acc = np.zeros((kk, 9, c), np.complex128)
        for m in range(nslots):
            acc += np.einsum("iab,ibc->iac", hi[:, m], psi[cols_np[:, m]])
        return acc

    t0 = time.perf_counter()
    psi = psi_np
    v = np_step(psi)
    dt_np_step = time.perf_counter() - t0
    base_time = dt_np_step * (lld - 1)
    gnnz_np = work / base_time / 1e9
    print(f"# numpy baseline: {base_time*1e3:.1f} ms -> {gnnz_np:.3f} Gnnz/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "bsr_recursion_spmv_throughput",
        "value": round(gnnz, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / gnnz_np, 3),
    }))


if __name__ == "__main__":
    main()
