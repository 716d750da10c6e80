import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
import rslmtoasa_tpu  # enables x64
import jax.numpy as jnp
rng = np.random.default_rng(0)
x = rng.standard_normal((300, 300))
y = rng.standard_normal((300, 300))
f = jax.jit(lambda a, b: a @ b)
z = np.asarray(f(jnp.asarray(x), jnp.asarray(y)))
print("dtype on device:", f(jnp.asarray(x), jnp.asarray(y)).dtype)
print("matmul err:", np.abs(z - x @ y).max())
g = jax.jit(lambda a, b: a * b + a)
z2 = np.asarray(g(jnp.asarray(x), jnp.asarray(y)))
print("eltwise err:", np.abs(z2 - (x*y+x)).max())
