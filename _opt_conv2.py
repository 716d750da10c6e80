#!/usr/bin/env python3
"""Component cost breakdown of the conv-df64 Lanczos step."""
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import split_complex
from rslmtoasa_tpu.ops.df64 import ds_add, ds_mul, ds_recip, ds_sqrt
from rslmtoasa_tpu.ops.stencil_conv import (
    build_conv_stencil, conv_start_vectors, pack_conv_kernel_df64,
    conv_spmv_df64, ds_dot_chain, _extract_chunks_chan,
)

lld = 20
sys_ = build_synthetic_bcc(rc=120.0, ndim=1000000, lld=lld)
st = build_conv_stencil(sys_.cluster)
hb = sys_.ham
hs_np = np.asarray(hb.ee[:, :, :9, :9])
hs_split = np.asarray(split_complex(hs_np[0]))
w, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
starts = list(range(0, hb.kk, max(1, hb.kk // 16)))[:16]
psi0_ds = conv_start_vectors(st, starts, 18, orbitals=range(9))
mask = jnp.asarray(st.mask)
hsc = jnp.float32(h_scale)
R = tuple(radius)


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = np.asarray(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3/19:.2f} ms/step ({dt*1e3:.0f} total)",
          flush=True)


@partial(jax.jit, static_argnames=())
def conv_only(ph, pl):
    def step(carry, _):
        psi = carry
        v = conv_spmv_df64(w, hsc, mask, psi, 7, R)
        # cheap rescale to keep magnitudes sane, no dots
        return (v[0] * jnp.float32(0.05), v[1] * jnp.float32(0.05)), ()
    carry, _ = jax.lax.scan(step, (ph, pl), None, length=19)
    return (jnp.sum(carry[0]),)


@partial(jax.jit, static_argnames=())
def conv_plus_dots(ph, pl):
    def step(carry, _):
        psi = carry
        v = conv_spmv_df64(w, hsc, mask, psi, 7, R)
        a = ds_dot_chain(v, psi)
        s = ds_recip(ds_sqrt(ds_dot_chain(v, v)))
        vn = ds_mul((s[0][:, None, None, None, None],
                     s[1][:, None, None, None, None]), v)
        return vn, (a[0], a[1])
    carry, ys = jax.lax.scan(step, (ph, pl), None, length=19)
    return (jnp.sum(carry[0]), ys[0])


@partial(jax.jit, static_argnames=())
def dots_only(ph, pl):
    def step(carry, _):
        psi = carry
        a = ds_dot_chain(psi, psi)
        s = ds_recip(ds_sqrt(a))
        vn = ds_mul((s[0][:, None, None, None, None],
                     s[1][:, None, None, None, None]), psi)
        return vn, (a[0], a[1])
    carry, ys = jax.lax.scan(step, (ph, pl), None, length=19)
    return (jnp.sum(carry[0]), ys[0])


@partial(jax.jit, static_argnames=())
def extract_only(ph, pl):
    def step(carry, _):
        psi = carry
        x = _extract_chunks_chan(psi, 7)
        # collapse back cheaply so the scan has a fixed carry
        y = x[:, :18].astype(jnp.float32)
        return (y, psi[1]), ()
    carry, _ = jax.lax.scan(step, (ph, pl), None, length=19)
    return (jnp.sum(carry[0]),)


@partial(jax.jit, static_argnames=())
def elementwise_only(ph, pl):
    def step(carry, _):
        psi_h, psi_l, pmn_h, pmn_l = carry
        t = ds_mul((jnp.float32(0.3), jnp.float32(0.0)), (psi_h, psi_l))
        pmn = ds_add(ds_add((pmn_h, pmn_l), (psi_h, psi_l)),
                     (-t[0], -t[1]))
        psi_new = ds_mul((jnp.float32(0.9), jnp.float32(0.0)), pmn)
        pm = ds_mul((jnp.float32(1.1), jnp.float32(0.0)), (psi_h, psi_l))
        return (psi_new[0], psi_new[1], -pm[0], -pm[1]), ()
    z = jnp.zeros_like(ph)
    carry, _ = jax.lax.scan(step, (ph, pl, z, z), None, length=19)
    return (jnp.sum(carry[0]),)


timeit("conv+extract only", conv_only, psi0_ds[0], psi0_ds[1])
timeit("conv+extract+2dots", conv_plus_dots, psi0_ds[0], psi0_ds[1])
timeit("2dots+1mul only", dots_only, psi0_ds[0], psi0_ds[1])
timeit("extract only", extract_only, psi0_ds[0], psi0_ds[1])
timeit("elementwise only", elementwise_only, psi0_ds[0], psi0_ds[1])
