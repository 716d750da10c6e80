import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
import rslmtoasa_tpu
import jax.numpy as jnp
cpu = jax.devices("cpu")[0]
rng = np.random.default_rng(1)

def cmp(name, f, *xs):
    z_dev = np.asarray(f(*map(jnp.asarray, xs)))
    with jax.default_device(cpu):
        z_ref = np.asarray(f(*map(jnp.asarray, xs)))
    print(name, "err", np.abs(z_dev-z_ref).max(), "scale", np.abs(z_ref).max())

K = 72000
x = rng.standard_normal((36, K)) / 30
y = rng.standard_normal((K, 36)) / 30
cmp("plain 2D (K=72k)", jax.jit(lambda a, b: a @ b), x, y)

x2 = rng.standard_normal((2000, 36, 36)) / 30
cmp("iab,ibc->ac single bigdot", jax.jit(lambda a, b: jnp.einsum("iba,ibc->ac", a, b)), x2, x2)
cmp("batched small r", jax.jit(lambda a, b: jnp.einsum("riba,ribc->rac", a[None], b[None])), x2, x2)
