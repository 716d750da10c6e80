import os, time
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax
jax.config.update("jax_platforms","cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.models.conductivity import build_velocity_operators
from rslmtoasa_tpu.ops.kubo import kubo_moments
from rslmtoasa_tpu.ops.block_lanczos import realify_blocks, unrealify_blocks

sys_ = build_synthetic_bcc(rc=20.0, lld=4, nsp=2)
hb = sys_.ham; kk = sys_.cluster.kk
print("kk", kk, flush=True)
v_a, v_b = build_velocity_operators(sys_, np.array([0.,1.,0.]), np.array([1.,0.,0.]))
lsh = hb.lsham if hb.lsham is not None else np.zeros((hb.ee.shape[0],18,18), np.complex128)
psi0 = np.zeros((kk,18,18), np.complex128); psi0[0]=np.eye(18)
a_s = (1.0 - (-1.5))/(2.0-0.3); b_s = (1.0 + (-1.5))/2.0
cond_ll = 100
t0=time.time()
mu64 = np.asarray(kubo_moments(jnp.asarray(hb.ee), jnp.asarray(lsh), jnp.asarray(hb.iz),
    jnp.asarray(hb.cols), jnp.asarray(v_a), jnp.asarray(v_b), jnp.asarray(psi0),
    n_moments=cond_ll, block_size=cond_ll, a=a_s, b=b_s))
print("f64 complex", time.time()-t0, flush=True)
t0=time.time()
psir = np.zeros((kk,36,36)); psir[0]=np.eye(36)
mu32 = unrealify_blocks(np.asarray(kubo_moments(
    jnp.asarray(realify_blocks(hb.ee), jnp.float32), jnp.asarray(realify_blocks(lsh), jnp.float32),
    jnp.asarray(hb.iz), jnp.asarray(hb.cols),
    jnp.asarray(realify_blocks(v_a), jnp.float32), jnp.asarray(realify_blocks(v_b), jnp.float32),
    jnp.asarray(psir, jnp.float32),
    n_moments=cond_ll, block_size=cond_ll, a=a_s, b=b_s)))
print("f32 realified", time.time()-t0, flush=True)
scale = np.abs(mu64).max()
err = np.abs(mu32-mu64).max()
print("mu scale", scale, "max err", err, "rel", err/scale)
# sigma(E) comparison via the Gamma assembly
from rslmtoasa_tpu.models.conductivity import ConductivityCalculation
