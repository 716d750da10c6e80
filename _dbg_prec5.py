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

x2 = rng.standard_normal((3, 2000, 36, 36)) / 30
def gram_flat(a, b):
    r, i, d, _ = a.shape
    a2 = a.reshape(r, i * d, d)
    b2 = b.reshape(r, i * d, d)
    return jnp.einsum("rKa,rKc->rac", a2, b2)
cmp("flattened gram rKa,rKc->rac", jax.jit(gram_flat), x2, x2)
# f32 variant for the kubo engine
x3 = (x2[0].astype(np.float32))
def kubo_flat(l, v):
    m = 4
    lb = jnp.stack([l]*m)         # (m, i, b, a)
    l2 = lb.reshape(m, -1, lb.shape[-1])
    v2 = v.reshape(-1, v.shape[-1])
    return jnp.einsum("mKa,Kc->mac", l2, v2)
cmp("kubo f32 flat mKa,Kc->mac", jax.jit(kubo_flat), x3, x3)
def kubo_orig(l, v):
    m = 4
    lb = jnp.stack([l]*m)
    return jnp.einsum("mkba,kbc->mac", lb.transpose(0,1,3,2), v)
cmp("kubo f32 orig mkba,kbc->mac", jax.jit(kubo_orig), x3, x3)
