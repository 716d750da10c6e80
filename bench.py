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

    # persistent compile cache: the axon TPU compile is slow (minutes);
    # repeated bench runs reuse the compiled executable
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rslmtoasa_tpu.models.presets import build_synthetic_bcc
    from rslmtoasa_tpu.ops.lanczos import (
        lanczos_coefficients_split,
        scalar_start_vectors,
        split_complex,
        split_vector,
    )

    lld = 20
    # production-scale cluster (~11k atoms) and a wide chain batch
    # (16 start atoms x 9 orbitals = 144 columns) so the MXU is fed;
    # the earlier 1-atom/3k-cluster size was dispatch-latency-bound.
    sys_ = build_synthetic_bcc(rc=120.0, ndim=1000000, lld=lld)
    hb = sys_.ham
    kk = hb.kk
    nslots = hb.nslots
    n_start = 16
    print(f"# cluster kk={kk} nslots={nslots} lld={lld} chains={9*n_start}",
          file=sys.stderr)

    # both spin channels, 2 x 9 orbital chains per start atom; batch chains.
    # split-complex f64 representation (TPU v5e has no native C128).
    hs_np = hb.ee[:, :, :9, :9]
    hs = split_complex(hs_np)
    iz = jnp.asarray(hb.iz)
    cols = jnp.asarray(hb.cols)
    starts = list(range(0, kk, max(1, kk // n_start)))[:n_start]
    psi0 = split_vector(scalar_start_vectors(kk, starts))
    c = psi0.shape[2]

    # scale factor input keeps every repetition a distinct execution
    fn = jax.jit(
        lambda h, i, co, p, s: lanczos_coefficients_split(h, i, co, p * s,
                                                          lld, slot_chunk=3)
    )
    # warmup/compile.  NOTE: on the axon backend block_until_ready does not
    # actually synchronise; a host readback of the result is the only
    # reliable barrier, so timings below always pull `a` back.
    t0 = time.perf_counter()
    a, b2 = fn(hs, iz, cols, psi0, 1.0)
    a_np = np.asarray(a)
    print(f"# compile+first run: {time.perf_counter()-t0:.1f} s",
          file=sys.stderr)
    reps = 5
    t0 = time.perf_counter()
    for r in range(reps):
        a, b2 = fn(hs, iz, cols, psi0, 1.0 + 1e-12 * r)
        a_np = np.asarray(a)
    dt = (time.perf_counter() - t0) / reps
    a = jnp.asarray(a_np)

    # nnz = Hamiltonian block entries touched per SpMV (9x9 per slot),
    # processed once per chain per recursion step
    nnz = kk * nslots * 81
    work = nnz * c * (lld - 1)
    gnnz = work / dt / 1e9
    print(f"# device recursion: {dt*1e3:.1f} ms -> {gnnz:.3f} Gnnz/s",
          file=sys.stderr)

    # correctness guard: the device coefficients must match a host f64
    # reference (catches silent downcasts / wrong execution)
    a_np = np.asarray(a)
    b2_np = np.asarray(b2)
    iz_np = np.asarray(hb.iz)
    cols_np = np.asarray(hb.cols)
    psi_c = scalar_start_vectors(kk, starts)
    hi = hs_np[iz_np]  # (kk, nslots, 9, 9)

    def np_spmv(psi):
        acc = np.zeros((kk, 9, c), np.complex128)
        for m in range(nslots):
            acc += np.einsum("iab,ibc->iac", hi[:, m], psi[cols_np[:, m]])
        return acc

    # host reference Lanczos (same recurrence); only the first
    # base_steps are timed and the rate extrapolated -- the per-step
    # cost is constant, and the correctness guard needs 3 steps anyway
    base_steps = 3
    psi = psi_c.copy()
    pmn = np.zeros((kk, 9, c), np.complex128)
    summ_prev = np.ones(c)
    t0 = time.perf_counter()
    for ll in range(base_steps):
        v = np_spmv(psi)
        a_ll = np.sum((v * psi[:-1].conj()).real, axis=(0, 1))
        pmn = pmn + v - a_ll[None, None, :] * psi[:-1]
        summ = np.sum(np.abs(pmn) ** 2, axis=(0, 1))
        s = np.sqrt(summ)
        psi_new = pmn / s[None, None, :]
        pmn = -psi[:-1] * s[None, None, :]
        psi = np.concatenate([psi_new, np.zeros((1, 9, c), np.complex128)], 0)
        if ll < 3:
            assert np.allclose(a_np[ll], a_ll, atol=1e-8), "device mismatch"
        summ_prev = summ
    base_time = (time.perf_counter() - t0) * (lld - 1) / base_steps
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
