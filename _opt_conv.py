#!/usr/bin/env python3
"""Experiment: conv-df64 Lanczos step variants on the bench workload."""
import sys
import time
from functools import partial

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import scalar_start_vectors, split_complex
from rslmtoasa_tpu.ops import df64
from rslmtoasa_tpu.ops.df64 import (
    ds_add, ds_add_f32, ds_mul, ds_recip, ds_sqrt, fast_two_sum,
    two_prod, two_sum,
)
from rslmtoasa_tpu.ops.stencil_conv import (
    build_conv_stencil, conv_start_vectors, pack_conv_kernel_df64,
    conv_spmv_df64, ds_dot_chain, _lanczos_conv_df64_jit,
)

lld = 20
sys_ = build_synthetic_bcc(rc=120.0, ndim=1000000, lld=lld)
hb = sys_.ham
kk = hb.kk
nslots = hb.nslots
n_start = 16
st = build_conv_stencil(sys_.cluster)
hs_np = np.asarray(hb.ee[:, :, :9, :9])
hs_split = np.asarray(split_complex(hs_np[0]))
w, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
starts = list(range(0, kk, max(1, kk // n_start)))[:n_start]
psi0_ds = conv_start_vectors(st, starts, 18, orbitals=range(9))
c = psi0_ds[0].shape[0]
mask = jnp.asarray(st.mask)
nnz = kk * nslots * 81
work = nnz * c * (lld - 1)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(out[0])
    compile_t = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms  {work/dt/1e9:.2f} Gnnz/s "
          f"(compile {compile_t:.1f}s)", flush=True)
    return out


# -------------------- baseline --------------------
base = timeit("baseline",
              lambda: _lanczos_conv_df64_jit(
                  w, mask, psi0_ds[0], psi0_ds[1], jnp.float32(h_scale),
                  lld, 7, tuple(radius)))
a_ref = np.asarray(base[0], np.float64) + np.asarray(base[1], np.float64)


def make_variant(unroll=1, keepdims=False):
    @partial(jax.jit, static_argnames=("lld", "nchunks", "radius"))
    def run(w, mask, psi0_hi, psi0_lo, h_scale, lld, nchunks, radius):
        def step(carry, _):
            psi_hi, psi_lo, pmn_hi, pmn_lo, sp_hi, sp_lo = carry
            psi = (psi_hi, psi_lo)
            v = conv_spmv_df64(w, h_scale, mask, psi, nchunks, radius)
            a_ll = ds_dot_chain(v, psi)
            if keepdims:
                a5 = (a_ll[0][:, None, None, None, None],
                      a_ll[1][:, None, None, None, None])
                t = ds_mul(a5, psi)
                pmn = ds_add(ds_add((pmn_hi, pmn_lo), v), (-t[0], -t[1]))
                summ = ds_dot_chain(pmn, pmn)
                s5 = (summ[0][:, None, None, None, None],
                      summ[1][:, None, None, None, None])
                sq = ds_sqrt(s5)
                rinv = ds_recip(sq)
                psi_new = ds_mul(rinv, pmn)
                pm = ds_mul(sq, psi)
            else:
                t = ds_mul((a_ll[0][:, None, None, None, None],
                            a_ll[1][:, None, None, None, None]), psi)
                pmn = ds_add(ds_add((pmn_hi, pmn_lo), v), (-t[0], -t[1]))
                summ = ds_dot_chain(pmn, pmn)
                s = ds_sqrt(summ)
                rinv = ds_recip(s)
                psi_new = ds_mul((rinv[0][:, None, None, None, None],
                                  rinv[1][:, None, None, None, None]), pmn)
                pm = ds_mul((s[0][:, None, None, None, None],
                             s[1][:, None, None, None, None]), psi)
            carry_out = (psi_new[0], psi_new[1], -pm[0], -pm[1],
                         summ[0], summ[1])
            return carry_out, (a_ll[0], a_ll[1], sp_hi, sp_lo)

        cc = psi0_hi.shape[0]
        pmn0 = jnp.zeros_like(psi0_hi)
        ones = jnp.ones((cc,), jnp.float32)
        zer = jnp.zeros((cc,), jnp.float32)
        carry0 = (psi0_hi, psi0_lo, pmn0, pmn0, ones, zer)
        carry, ys = jax.lax.scan(step, carry0, None, length=lld - 1,
                                 unroll=unroll)
        return ys[0], ys[1], ys[2], ys[3], carry[4], carry[5]
    return run


for name, kw in [("unroll2", dict(unroll=2)),
                 ("unroll4", dict(unroll=4)),
                 ("keepdims", dict(keepdims=True)),
                 ("keepdims+unroll2", dict(keepdims=True, unroll=2))]:
    fn = make_variant(**kw)
    out = timeit(name, lambda fn=fn: fn(w, mask, psi0_ds[0], psi0_ds[1],
                                        jnp.float32(h_scale), lld, 7,
                                        tuple(radius)))
    a_v = np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
    print("   max |da| =", np.abs(a_v - a_ref).max(), flush=True)
