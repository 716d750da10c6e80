#!/usr/bin/env python3
"""Experiments: rint-based barrier-free chunk extraction + int8 MXU conv."""
import time
from functools import partial

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import split_complex
from rslmtoasa_tpu.ops import df64
from rslmtoasa_tpu.ops.df64 import two_sum
from rslmtoasa_tpu.ops.stencil_conv import (
    build_conv_stencil, conv_start_vectors, pack_conv_kernel_df64,
    _extract_chunks_chan,
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
R = tuple(radius)
NC = 7


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
    return out


def extract_rint(y, nchunks: int):
    """Barrier-free chunk extraction: fixed-point rounding via rint.
    y: (hi, lo) f32 (C, D, ...) -> bf16 (C, nchunks*D, ...)."""
    hi, lo = y
    r = hi * jnp.float32(0.5)
    w_lo = lo * jnp.float32(0.5)
    outs = []
    for k in range(nchunks):
        q = jnp.float32(2.0 ** (-df64.CHUNK_BITS * (k + 1)))
        iq = jnp.float32(2.0 ** (df64.CHUNK_BITS * (k + 1)))
        c = jnp.rint(r * iq) * q
        outs.append(c.astype(jnp.bfloat16))
        r = r - c
        if k == 2:
            r, w_lo = two_sum(r, w_lo)
        elif k == 3:
            r = r + w_lo
    d = hi.shape[1]
    out = jnp.concatenate(outs, axis=1)
    # chunk-major grouping: concat gives [c0 ch, c1 ch, ...] = s*D + a
    return out


@jax.jit
def ext_old(ph, pl):
    def step(carry, _):
        psi = carry
        x = _extract_chunks_chan(psi, NC)
        y = x[:, :18].astype(jnp.float32)
        return (y, psi[1]), ()
    carry, _ = jax.lax.scan(step, (ph, pl), None, length=19)
    return (jnp.sum(carry[0]),)


@jax.jit
def ext_new(ph, pl):
    def step(carry, _):
        psi = carry
        x = extract_rint(psi, NC)
        y = x[:, :18].astype(jnp.float32)
        return (y, psi[1]), ()
    carry, _ = jax.lax.scan(step, (ph, pl), None, length=19)
    return (jnp.sum(carry[0]),)


# correctness: same chunks?
x_old = _extract_chunks_chan(psi0_ds, NC)
x_new = extract_rint(psi0_ds, NC)
d0 = np.abs(np.asarray(x_old, np.float32) - np.asarray(x_new, np.float32))
print("extract diff max:", d0.max(), flush=True)

timeit("extract old", ext_old, psi0_ds[0], psi0_ds[1])
timeit("extract rint", ext_new, psi0_ds[0], psi0_ds[1])

# ---------------- int8 conv microbench -----------------
C = psi0_ds[0].shape[0]
dims = st.dims
rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(-64, 65, (C, NC * 18) + dims), jnp.int8)
w8 = jnp.asarray(rng.integers(-64, 65, (NC * 18, NC * 18, 3, 3, 3)),
                 jnp.int8)
xb = x8.astype(jnp.bfloat16)
wb = w8.astype(jnp.bfloat16)
pad = [(1, 1)] * 3


@jax.jit
def conv_i8(x):
    def step(carry, _):
        o = lax.conv_general_dilated(
            carry, w8, window_strides=(1, 1, 1), padding=pad,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.int32)
        nxt = jnp.clip(o // 1024, -64, 64).astype(jnp.int8)
        return nxt, ()
    carry, _ = jax.lax.scan(step, x, None, length=19)
    return (jnp.sum(carry.astype(jnp.int32)),)


@jax.jit
def conv_bf(x):
    def step(carry, _):
        o = lax.conv_general_dilated(
            carry, wb, window_strides=(1, 1, 1), padding=pad,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32)
        nxt = (o * jnp.float32(1.0 / 1024.0)).astype(jnp.bfloat16)
        return nxt, ()
    carry, _ = jax.lax.scan(step, x, None, length=19)
    return (jnp.sum(carry.astype(jnp.float32)),)


timeit("conv bf16 (126ch)", conv_bf, xb)
timeit("conv int8 (126ch)", conv_i8, x8)
