import os
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import lanczos_coefficients, scalar_start_vectors, split_complex
from rslmtoasa_tpu.ops.stencil_conv import build_conv_stencil, conv_start_vectors, pack_conv_kernel_df64, lanczos_coefficients_conv_df64
sys_ = build_synthetic_bcc(rc=16.0, ndim=4000, lld=12)
hb = sys_.ham; cl = sys_.cluster; lld=12
blk = hb.ee[:, :, :9, :9]
psi0 = scalar_start_vectors(cl.kk, [0,3])
a_ref, b2_ref = lanczos_coefficients(jnp.asarray(blk), jnp.asarray(hb.iz), jnp.asarray(hb.cols), jnp.asarray(psi0), lld)
a_ref = np.asarray(a_ref)
st = build_conv_stencil(cl)
hs_split = np.asarray(split_complex(blk[0]))
w, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
psi0_ds = conv_start_vectors(st, [0,3], 18)
a, b2 = lanczos_coefficients_conv_df64(w, h_scale, st.mask, psi0_ds, lld, radius=radius)
print("max da:", np.abs(a - a_ref).max())
print("max db2:", np.abs(b2 - np.asarray(b2_ref)).max())
