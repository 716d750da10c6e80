import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import scalar_start_vectors, split_complex
from rslmtoasa_tpu.ops.stencil_conv import (build_conv_stencil, conv_start_vectors,
    pack_conv_kernel_df64, _lanczos_conv_df64_jit)
from rslmtoasa_tpu.ops import pallas_conv as pc

lld = 20
sys_ = build_synthetic_bcc(rc=120.0, ndim=1000000, lld=lld)
hb = sys_.ham; cl = sys_.cluster
st = build_conv_stencil(cl)
kk, nslots = hb.kk, hb.nslots
hs_split = np.asarray(split_complex(np.asarray(hb.ee[0, :, :9, :9])))
starts = list(range(0, kk, max(1, kk // 16)))[:16]
C = 144
work = kk * nslots * 81 * C * (lld - 1)

# XLA conv engine
w, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
psi0_ds = conv_start_vectors(st, starts, 18, orbitals=range(9))
mask = jnp.asarray(st.mask)
def run_xla():
    out = _lanczos_conv_df64_jit(w, mask, psi0_ds[0], psi0_ds[1],
                                 jnp.float32(h_scale), lld, 7, tuple(radius))
    return np.asarray(out[0]), np.asarray(out[1])
a1h, a1l = run_xla()
t0 = time.perf_counter(); a1h, a1l = run_xla(); dt1 = time.perf_counter()-t0
print(f"xla conv engine: {dt1*1e3:.0f} ms -> {work/dt1/1e9:.2f} Gnnz/s", flush=True)

# pallas engine
fs = pc.build_flat_stencil(st)
wt, hsc, dxs, colshifts = pc.pack_flat_kernel(hs_split, st)
p0 = pc.flat_start_vectors(fs, starts, 18, orbitals=range(9))
maskf = jnp.asarray(fs.mask)
def run_pl():
    out = pc._lanczos_flat_df64_jit(wt, maskf, p0[0], p0[1], float(hsc),
                                    lld, 7, 18, tuple(dxs), tuple(colshifts))
    return np.asarray(out[0]), np.asarray(out[1])
t0 = time.perf_counter(); a2h, a2l = run_pl()
print(f"pallas compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter(); a2h, a2l = run_pl(); dt2 = time.perf_counter()-t0
print(f"pallas engine: {dt2*1e3:.0f} ms -> {work/dt2/1e9:.2f} Gnnz/s", flush=True)
a1 = a1h.astype(np.float64)+a1l; a2 = a2h.astype(np.float64)+a2l
print("a diff xla vs pallas:", np.abs(a1-a2).max(), flush=True)
