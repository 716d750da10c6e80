import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
import rslmtoasa_tpu
import jax.numpy as jnp
rng = np.random.default_rng(1)
x = rng.standard_normal((1, 2000, 36, 36)) / 30
cpu = jax.devices("cpu")[0]
for prec in (None, "highest"):
    g = jax.jit(lambda a, b: jnp.einsum("riab,ribc->rac", a, b, precision=prec))
    z_dev = np.asarray(g(jnp.asarray(x.swapaxes(-1,-2)), jnp.asarray(x)))
    with jax.default_device(cpu):
        z_ref = np.asarray(g(jnp.asarray(x.swapaxes(-1,-2)), jnp.asarray(x)))
    print(f"prec={prec}: err", np.abs(z_dev-z_ref).max(), "scale", np.abs(z_ref).max())
# also try summing a batched matmul instead of fused contraction
g2 = jax.jit(lambda a, b: jnp.einsum("riab,ribc->riac", a, b).sum(axis=1))
z_dev = np.asarray(g2(jnp.asarray(x.swapaxes(-1,-2)), jnp.asarray(x)))
with jax.default_device(cpu):
    z_ref = np.asarray(g2(jnp.asarray(x.swapaxes(-1,-2)), jnp.asarray(x)))
print("per-i matmul + sum: err", np.abs(z_dev-z_ref).max())
