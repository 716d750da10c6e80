import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
import sys
if "hi" in sys.argv:
    jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.block_lanczos import (block_lanczos, block_lanczos_split, block_start_vectors)

sys_ = build_synthetic_bcc(rc=16.0, ndim=4000, lld=8, nsp=2)
hb = sys_.ham
kk = sys_.cluster.kk
lld = 8
ntype = hb.ee.shape[0]
lsham = hb.lsham if hb.lsham is not None else np.zeros((ntype, 18, 18), np.complex128)
psi0 = block_start_vectors(kk, [0])
a_dev, b2_dev = block_lanczos_split(hb.ee, lsham, hb.iz, hb.cols, psi0, lld)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    a_ref, b2_ref = block_lanczos(jnp.asarray(hb.ee), jnp.asarray(lsham),
        jnp.asarray(hb.iz), jnp.asarray(hb.cols), jnp.asarray(psi0), lld)
print("max|dev-cpu| a:", np.abs(np.asarray(a_dev)-np.asarray(a_ref)).max())
print("max|dev-cpu| b2:", np.abs(np.asarray(b2_dev)-np.asarray(b2_ref)).max())
