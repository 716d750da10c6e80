"""rslmtoasa_tpu — a TPU-native real-space LMTO-ASA electronic-structure framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
RS-LMTO-ASA reference code (Haydock/block-Lanczos/Chebyshev recursion over
block-sparse real-space tight-binding Hamiltonians, self-consistent
charge/spin densities, LDOS, exchange couplings, Kubo-Bastin conductivity,
atomistic spin dynamics), designed TPU-first:

* geometry / structure-constant setup on host (NumPy, one-time),
* all recursion/Green-function hot loops as batched JAX computations
  (``vmap`` over chains, ``lax.scan`` over recursion depth) with Pallas
  kernels for the block-sparse matrix-vector products,
* multi-chip scaling via ``jax.sharding`` meshes (``psum`` reductions over
  chain shards), mirroring the reference's MPI allreduce semantics.
"""

__version__ = "0.1.0"

import os

# The physics requires f64 for parity with the Fortran reference
# (tests demand 1e-6 agreement; see SURVEY.md §4).
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)

# Accelerator plugins (axon) ignore the JAX_PLATFORMS env var alone;
# forcing the host backend needs the config knob set before first use.
if os.environ.get("RSLMTO_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from .config import JobConfig  # noqa: E402

__all__ = ["JobConfig", "__version__"]
