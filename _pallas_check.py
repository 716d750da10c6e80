import os
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, jax.numpy as jnp
from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import scalar_start_vectors, split_complex, lanczos_coefficients
from rslmtoasa_tpu.ops.stencil_conv import (build_conv_stencil, conv_start_vectors,
    pack_conv_kernel_df64, conv_spmv_df64)
from rslmtoasa_tpu.ops import pallas_conv as pc

jax.config.update("jax_enable_x64", True)
sys_ = build_synthetic_bcc(rc=16.0, ndim=4000, lld=6)
hb = sys_.ham; cl = sys_.cluster
st = build_conv_stencil(cl)
print("dims", st.dims, "kk", cl.kk)
blk = hb.ee[:, :, :9, :9]
hs_split = np.asarray(split_complex(blk[0]))
# XLA conv engine SpMV on a random df64 psi
w_conv, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
rng = np.random.default_rng(3)
C = 4
psi_box = (rng.standard_normal((C, 18) + st.dims) * st.mask[None, None]).astype(np.float32)
psi_ds = (jnp.asarray(psi_box), jnp.zeros_like(jnp.asarray(psi_box)))
v_ref = conv_spmv_df64(jnp.asarray(w_conv), h_scale, jnp.asarray(st.mask), psi_ds, 7, radius)
v_ref = np.asarray(v_ref[0], np.float64) + np.asarray(v_ref[1], np.float64)

# pallas flat engine
fs = pc.build_flat_stencil(st)
wt, hsc, dxs, colshifts = pc.pack_flat_kernel(hs_split, st)
# scatter psi_box into flat layout
flat = np.zeros((C, fs.nxp, 18, fs.roww), np.float32)
nx, ny, nz = st.dims
for i in range(st.kk):
    x0,y0,z0 = st.coords[i]
    flat[:, fs.planes[i], :, fs.cols[i]] = psi_box[:, :, x0, y0, z0]
pf = (jnp.asarray(flat), jnp.zeros_like(jnp.asarray(flat)))
vh, vl = pc.conv_spmv_df64_pallas(wt, jnp.asarray(fs.mask), pf, hsc,
    nchunks=7, d=18, dxs=dxs, colshifts=colshifts, interpret=True)
vfl = np.asarray(vh, np.float64) + np.asarray(vl, np.float64)
# gather back
vg = np.zeros((C, 18) + st.dims)
for i in range(st.kk):
    x0,y0,z0 = st.coords[i]
    vg[:, :, x0, y0, z0] = vfl[:, fs.planes[i], :, fs.cols[i]]
print("spmv max diff:", np.abs(vg - v_ref).max(), " ref scale:", np.abs(v_ref).max())

# full recursion vs complex128
lld = 6
psi0 = scalar_start_vectors(cl.kk, [0, 3])
a_ref, b_ref = lanczos_coefficients(jnp.asarray(blk), jnp.asarray(hb.iz), jnp.asarray(hb.cols), jnp.asarray(psi0), lld)
p0 = pc.flat_start_vectors(fs, [0, 3], 18, orbitals=range(9))
a, b2 = pc.lanczos_coefficients_flat_df64(wt, hsc, fs.mask, p0, lld,
    dxs=dxs, colshifts=colshifts, interpret=True)
print("a diff:", np.abs(a - np.asarray(a_ref)).max())
print("b2 diff:", np.abs(b2 - np.asarray(b_ref)).max())
