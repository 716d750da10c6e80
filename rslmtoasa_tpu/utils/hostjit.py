"""Host-pinned jit for complex128 post-processing.

TPU backends (axon/v5e) have no native complex dtypes; the x64 rewriter
aborts on f64 -> c128 conversions (observed: SIGABRT in the LDOS
continued fraction when the CLI runs on the device).  The continued
fractions / Green reconstructions are tiny compared to the recursion
engines, so on non-CPU backends they run as CPU-compiled jits in the
same process: the reference splits the same way between the recursion
hot loop and the ``density_of_states``/``green`` post-processing
(density_of_states.f90:377-419).
"""

from __future__ import annotations

from functools import wraps

import jax


def host_jit(fn=None, **jit_kwargs):
    """``jax.jit`` that always executes on the host CPU backend.

    On a CPU-default process this is plain ``jax.jit``.  On accelerator
    backends the call runs under ``jax.default_device(cpu)`` so tracing,
    compilation, and argument placement all target the CPU client —
    complex128 stays legal regardless of the accelerator's dtype set.
    """
    if fn is None:
        return lambda f: host_jit(f, **jit_kwargs)
    jfn = jax.jit(fn, **jit_kwargs)

    @wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.default_backend() == "cpu":
            return jfn(*args, **kwargs)
        import numpy as np

        def to_host(x):
            if isinstance(x, jax.Array) and \
                    x.sharding.device_set and \
                    next(iter(x.sharding.device_set)).platform != "cpu":
                return np.asarray(x)
            return x

        args = jax.tree_util.tree_map(to_host, args)
        kwargs = jax.tree_util.tree_map(to_host, kwargs)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            return jfn(*args, **kwargs)

    return wrapper
