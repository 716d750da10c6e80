import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
import rslmtoasa_tpu
import jax.numpy as jnp
from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.block_lanczos import realify_blocks, block_start_vectors, _spmv18

sys_ = build_synthetic_bcc(rc=16.0, ndim=4000, lld=8, nsp=2)
hb = sys_.ham
kk = sys_.cluster.kk
hs = np.asarray(realify_blocks(hb.ee))
psi0 = np.asarray(realify_blocks(block_start_vectors(kk, [0])))
iz = np.asarray(hb.iz); cols = np.asarray(hb.cols)
rng = np.random.default_rng(1)
psi = (rng.standard_normal(psi0.shape) / 100).astype(np.float64)

f = jax.jit(lambda hs_, iz_, cols_, psi_: _spmv18(hs_, iz_, cols_, psi_, 3))
y_dev = np.asarray(f(jnp.asarray(hs), jnp.asarray(iz), jnp.asarray(cols), jnp.asarray(psi)))
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    y_ref = np.asarray(f(jnp.asarray(hs), jnp.asarray(iz), jnp.asarray(cols), jnp.asarray(psi)))
print("spmv err:", np.abs(y_dev - y_ref).max(), "scale:", np.abs(y_ref).max())

g = jax.jit(lambda a, b: jnp.einsum("riab,ribc->rac", a, b))
z_dev = np.asarray(g(jnp.asarray(psi[:, :-1].swapaxes(-1,-2)), jnp.asarray(psi[:, :-1])))
with jax.default_device(cpu):
    z_ref = np.asarray(g(jnp.asarray(psi[:, :-1].swapaxes(-1,-2)), jnp.asarray(psi[:, :-1])))
print("gram err:", np.abs(z_dev - z_ref).max(), "scale:", np.abs(z_ref).max())
