"""Automatic engine dispatch: single-device vs mesh-sharded execution.

The reference partitions every phase's independent work over MPI ranks
(atoms for SCF, ij-pairs for exchange, types for conductivity;
``source/mpi.f90:32-58``, re-initialised per phase at
``calculation.f90:252,863,1002``) and allreduces the results.  Here the
same axis — the batch of independent recursion chains — is sharded over
a ``jax.sharding.Mesh`` whenever more than one device is visible, and
gathered back to the host (the allreduce-sum analogue; chain results are
disjoint, so the gather is exact and rank-count independent).

Every production driver (SCF bulk/surface/impurity, exchange,
conductivity) calls these entry points, so ``dryrun_multichip`` and the
CPU-mesh parity test exercise the real pipeline.

Multi-host: call :func:`init_distributed` once at process start (the CLI
does); it wires ``jax.distributed.initialize`` from the standard
coordinator environment variables when present.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import numpy as np

from ..utils.logger import FatalError


_mesh_cache = {"mesh": None, "checked": False}

#: host-array -> device-array transfer cache (weak #7: the SCF loop
#: re-uploads constant tables — cols, psi0 — every iteration; the
#: reference keeps them resident for the whole run).  Entries pin the
#: host array, so an id cannot be recycled while its entry lives.
_dev_cache: dict = {}
_DEV_CACHE_MAX = 24


def dev_cached(arr, realify: bool = False):
    """Device (optionally realified) image of a host array, cached by
    object identity.  Cached host arrays are frozen
    (``writeable=False``) so a later in-place mutation raises instead
    of silently serving a stale device image; producers build fresh
    arrays when values change (and do)."""
    import jax
    import jax.numpy as jnp

    if arr is None:
        return None
    if isinstance(arr, jax.Array):
        return arr
    key = (id(arr), realify)
    ent = _dev_cache.get(key)
    if ent is not None and ent[0] is arr:
        return ent[1]
    if isinstance(arr, np.ndarray) and arr.flags.owndata:
        arr.flags.writeable = False  # poison: stale-cache guard
    if realify:
        from ..ops.block_lanczos import realify_blocks

        dev = jnp.asarray(realify_blocks(arr))
    else:
        dev = jnp.asarray(arr)
    if len(_dev_cache) >= _DEV_CACHE_MAX:
        _dev_cache.pop(next(iter(_dev_cache)))
    _dev_cache[key] = (arr, dev)
    return dev


def init_distributed() -> None:
    """Multi-host bring-up (reference MPI_INIT analogue, main.f90:26-49).

    No-op unless the standard JAX coordinator variables are set
    (``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` +
    ``JAX_PROCESS_ID``), so single-host runs never pay for it.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )


def get_mesh():
    """The chain-sharding mesh over all visible devices, or ``None`` on a
    single device (or when ``RSLMTO_NO_MESH`` is set)."""
    if _mesh_cache["checked"]:
        return _mesh_cache["mesh"]
    _mesh_cache["checked"] = True
    if os.environ.get("RSLMTO_NO_MESH"):
        return None
    import jax

    if len(jax.devices()) < 2:
        return None
    from .mesh import make_mesh

    _mesh_cache["mesh"] = make_mesh()
    return _mesh_cache["mesh"]


def _pad_axis(x: np.ndarray, axis: int, mult: int) -> Tuple[np.ndarray, int]:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths), n


def _mesh_for(n_chains: int):
    """The mesh, or None when there are fewer chains than devices (the
    reference leaves surplus MPI ranks idle in that regime — running
    single-device avoids pure padding overhead)."""
    mesh = get_mesh()
    if mesh is None:
        return None
    d = int(np.prod(list(mesh.shape.values())))
    return mesh if n_chains >= d else None


def _wavefront_plan(cols, kk: int, psi0, lld: int, hoh: bool,
                    starts=None, kind: str = "lanczos"):
    """Active-set plan for large clusters (create_ll_map analogue,
    recursion.f90:3277-3303), or ``None`` when dense is better.

    Engages above ``RSLMTO_WAVEFRONT_KK`` atoms (default 30000) when the
    recursion ball is genuinely smaller than the cluster.  ``starts``
    defaults to the nonzero rows of ``psi0``.
    """
    thr = int(os.environ.get("RSLMTO_WAVEFRONT_KK", "30000"))
    if kk < thr:
        return None
    if starts is None:
        p = np.abs(np.asarray(psi0))
        axes = tuple(i for i in range(p.ndim)
                     if i != (1 if p.ndim == 4 else 0))
        rows = p.sum(axis=axes)[:kk]
        starts = np.nonzero(rows)[0]
        if starts.size == 0 or starts.size > 4096:
            return None
    from ..ops.wavefront import make_plan, make_plan_chebyshev

    mk = make_plan_chebyshev if kind == "chebyshev" else make_plan
    plan = mk(np.asarray(cols), kk, starts, lld,
              hops_per_step=2 if hoh else 1)
    if plan.work >= 0.7 * plan.dense_work:
        return None
    return plan


def _ms_engine_for(cluster, hs, lsham, hoh, hso, enim, local=None):
    """Multi-site df64 conv engine for a crystal cluster, or ``None``
    when the cluster has no constant-offset stencil (impurity zones,
    wrapped PBC, layered types) or the engine is disabled.

    The stencil geometry is cached on the cluster; the packed kernel
    depends on the Hamiltonian and is rebuilt per call (the SCF rebuilds
    the blocks every iteration)."""
    if cluster is None or os.environ.get("RSLMTO_NO_MSCONV"):
        return None
    from ..ops.msconv import MSEngine, build_ms_stencil

    st = getattr(cluster, "_ms_stencil", None)
    if st is None:
        if getattr(cluster, "_ms_stencil_failed", False):
            return None
        try:
            st = build_ms_stencil(cluster)
        except ValueError as e:
            from ..utils.logger import g_logger

            g_logger.info(f"multi-site conv engine unavailable ({e}); "
                          "using the gather engine")
            cluster._ms_stencil_failed = True
            return None
        cluster._ms_stencil = st
    # bytes model (replaces the round-3 RSLMTO_MS_IMP_CELLS atom-count
    # gate): a single chain column-batch must fit the per-chip budget —
    # a runtime OOM on the axon backend crashes the TPU worker process,
    # so prediction is the only safe gate.  d-aware: spin-sector (9x9)
    # problems need 4x less than the full 18x18 block state, so a
    # cluster too big for the full engine may still fit per sector.
    d2 = 2 * int(np.asarray(hs).shape[-1])
    nd = st.ntot * d2
    per_chain = int(np.prod(st.dims)) * nd * d2 * 150
    budget = int(os.environ.get("RSLMTO_MS_HBM_BYTES", 9 << 30))
    grid_shard = False
    if per_chain > budget:
        from ..utils.logger import g_logger

        # beyond-HBM route: shard the cell grid over the mesh with
        # ppermute halo exchange (ops/msconv_shard.py); corrected
        # stencils (surface layer types, impurity hall rows) ride the
        # same route with per-shard gather-correction tables
        mesh = get_mesh()
        ndev = (int(np.prod(list(mesh.shape.values())))
                if mesh is not None else 1)
        if mesh is not None and per_chain // ndev <= budget:
            grid_shard = True
            g_logger.info(
                f"multi-site conv engine: ~{per_chain/2**30:.1f} GiB "
                f"per chain exceeds one chip; grid-sharding over "
                f"{ndev} devices")
        else:
            g_logger.info(
                f"multi-site conv engine needs ~{per_chain/2**30:.1f} "
                f"GiB per chain (> {budget/2**30:.1f} GiB budget); "
                "using the gather engine")
            return None
    try:
        eng = MSEngine(st, hs, lsham, hoh=hoh, hso=hso, enim=enim,
                       local=local)
        eng._grid_shard = grid_shard
        return eng
    except ValueError:
        return None


def _spin_diag(m) -> bool:
    """True when every 18x18 block of ``m`` has exactly zero
    spin-off-diagonal (up-down / down-up) 9x9 blocks."""
    if m is None:
        return True
    m = np.asarray(m)
    return (not np.count_nonzero(m[..., :9, 9:])
            and not np.count_nonzero(m[..., 9:, :9]))


def _spin_sectors(hs, lsham, hso, enim, psi0, ms_local):
    """Collinear spin-sector decoupling (nsp<=2, no SOC).

    When H, eeo, enim, the SOC table and the start-block columns are all
    spin-block-diagonal, the 18-wide block recursion decouples EXACTLY
    into two independent 9-wide recursions: a_ll = psi^H H psi, B^2, B,
    B^-1 and psi stay spin-block-diagonal at every step (the up columns
    never acquire down rows and vice versa), so running the 9x9 sectors
    separately reproduces the 18x18 recursion to roundoff.  The
    reference always processes the full 18x18 blocks
    (``recursion.f90`` ``hop_b`` :1560) — on the MXU those zero
    spin-off-diagonal blocks are real work, so the split is a 4x flop
    cut on every collinear case, and both sector calls share one
    compiled executable (identical shapes, the kernels are runtime
    operands).

    Returns [(hs, lsham, hso, enim, psi0, ms_local)] per sector, or
    ``None`` when the problem does not decouple.
    """
    if (np.asarray(psi0).shape[-1] != 18
            or os.environ.get("RSLMTO_NO_SPIN_SPLIT")):
        return None
    if not (_spin_diag(hs) and _spin_diag(lsham) and _spin_diag(hso)
            and _spin_diag(enim) and _spin_diag(psi0)):
        return None
    if ms_local is not None and not (
            _spin_diag(ms_local.get("hall"))
            and _spin_diag(ms_local.get("hallo"))):
        return None

    def cut(m, sl):
        return None if m is None else np.ascontiguousarray(
            np.asarray(m)[..., sl, sl])

    out = []
    for s in range(2):
        sl = slice(9 * s, 9 * s + 9)
        ml = None
        if ms_local is not None:
            ml = dict(ms_local, hall=cut(ms_local["hall"], sl),
                      hallo=cut(ms_local.get("hallo"), sl))
        out.append((cut(hs, sl), cut(lsham, sl), cut(hso, sl),
                    cut(enim, sl), cut(psi0, sl), ml))
    return out


def _spin_assemble(xu, xd):
    """Reassemble per-sector (..., 9, 9) results into spin-block-diagonal
    (..., 18, 18) arrays (the off-diagonal blocks are exactly zero)."""
    xu = np.asarray(xu)
    out = np.zeros(xu.shape[:-2] + (18, 18), xu.dtype)
    out[..., :9, :9] = xu
    out[..., 9:, 9:] = np.asarray(xd)
    return out


def block_lanczos_auto(hs, lsham, iz, cols, psi0, lld, *, hoh=False,
                       hso=None, enim=None, iz_onsite=None, starts=None,
                       cluster=None, ms_local=None):
    """Block recursion over R chains, sharded over the mesh when present.

    All inputs host arrays (complex128); returns host (a_b, b2_b) of
    shape (lld, R, 18, 18).  Chains are independent, so padding R to a
    multiple of the mesh size with copies of chain 0 and dropping the
    pads afterwards is exact.

    Large clusters route through the active-set wavefront engine
    (``ops/wavefront.py``) — O(recursion ball) work instead of O(kk)
    per step, the reference's ``create_ll_map`` device.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.block_lanczos import block_lanczos, block_lanczos_split

    accel = jax.default_backend() != "cpu"
    mesh = _mesh_for(np.asarray(psi0).shape[0])
    eng = None
    if accel and ms_local is not None:
        # impurity: the combined [hall; ee] row table splits into the
        # bulk conv kernel + per-atom local gather corrections
        nmax = int(ms_local["nmax"])
        eng = _ms_engine_for(cluster, np.asarray(hs)[nmax:], lsham, hoh,
                             np.asarray(hso)[nmax:]
                             if hso is not None else None,
                             enim, local=ms_local)
    elif accel and (iz_onsite is None or np.array_equal(iz_onsite, iz)):
        # TPU production path: multi-site df64 bucket-conv engine
        # (ops/msconv.py) — exact SpMV on the MXU, ~1e-11 vs complex128
        eng = _ms_engine_for(cluster, hs, lsham, hoh, hso, enim)
    if eng is None:
        # collinear spin-sector split — ONLY for the non-conv paths
        # (CPU einsums, the emulated-f64 gather engine, the wavefront
        # engine), where the work is flop-bound and two 9x9-sector
        # recursions are a 4x cut.  The conv engine's per-step cost is
        # launch/relayout-floor bound at these widths (measured: a
        # quarter-flop 9x9 sector ran at the SAME wall as the full
        # 18x18 step), so splitting there doubles the sequential scan
        # count for no kernel-time win.
        sec = _spin_sectors(hs, lsham, hso, enim, psi0, ms_local)
        if sec is not None:
            outs = [
                block_lanczos_auto(h_, l_, iz, cols, p_, lld, hoh=hoh,
                                   hso=o_, enim=e_, iz_onsite=iz_onsite,
                                   starts=starts, cluster=cluster,
                                   ms_local=ml_)
                for (h_, l_, o_, e_, p_, ml_) in sec
            ]
            return (_spin_assemble(outs[0][0], outs[1][0]),
                    _spin_assemble(outs[0][1], outs[1][1]))
    if eng is not None and getattr(eng, "_grid_shard", False):
        # beyond-HBM: cell grid sharded over the full mesh with halo
        # exchange; chains replicated (they would not fit one chip)
        from ..ops.msconv_shard import block_lanczos_ms_sharded

        p0 = np.asarray(psi0)
        return block_lanczos_ms_sharded(eng, get_mesh(), eng.embed(p0),
                                        lld)
    if mesh is None:
        if eng is not None:
            p0 = np.asarray(psi0)
            try:
                return eng.block_lanczos(eng.embed(p0), lld,
                                         start_bbox=eng.start_bbox(p0))
            except Exception as e:  # device OOM -> gather engine
                from ..utils.logger import g_logger

                g_logger.info(f"ms-conv engine failed at runtime "
                              f"({type(e).__name__}); falling back to "
                              "the gather engine")
        plan = _wavefront_plan(cols, np.asarray(psi0).shape[1] - 1,
                               psi0, lld, hoh, starts=starts)
        if plan is not None:
            from ..ops.wavefront import block_lanczos_wavefront

            if accel:
                from ..ops.block_lanczos import (
                    realify_blocks,
                    unrealify_blocks,
                )

                a_b, b2_b = block_lanczos_wavefront(
                    realify_blocks(hs), realify_blocks(lsham),
                    np.asarray(iz), np.asarray(cols),
                    realify_blocks(psi0), lld, plan, hoh=hoh,
                    hso=realify_blocks(hso) if hso is not None else None,
                    enim=realify_blocks(enim) if enim is not None else None,
                    iz_onsite=(np.asarray(iz_onsite)
                               if iz_onsite is not None else None))
                return unrealify_blocks(a_b), unrealify_blocks(b2_b)
            return block_lanczos_wavefront(
                np.asarray(hs), np.asarray(lsham), np.asarray(iz),
                np.asarray(cols), np.asarray(psi0), lld, plan, hoh=hoh,
                hso=np.asarray(hso) if hso is not None else None,
                enim=np.asarray(enim) if enim is not None else None,
                iz_onsite=(np.asarray(iz_onsite)
                           if iz_onsite is not None else None))
        if accel:
            # realified single-device fallback (impurity/surface
            # clusters without a conv stencil).  Constant tables (cols,
            # iz, psi0) stay device-resident across SCF iterations via
            # dev_cached (only the Hamiltonian blocks — rebuilt fresh
            # each iteration — re-upload).
            from ..ops.block_lanczos import unrealify_blocks

            a_b, b2_b = block_lanczos(
                dev_cached(np.asarray(hs), realify=True),
                dev_cached(np.asarray(lsham), realify=True),
                dev_cached(np.asarray(iz)), dev_cached(np.asarray(cols)),
                dev_cached(np.asarray(psi0), realify=True), lld, hoh=hoh,
                hso=(dev_cached(np.asarray(hso), realify=True)
                     if hso is not None else None),
                enim=(dev_cached(np.asarray(enim), realify=True)
                      if enim is not None else None),
                iz_onsite=(dev_cached(np.asarray(iz_onsite))
                           if iz_onsite is not None else None),
                slot_chunk=3)
            return unrealify_blocks(np.asarray(a_b)), \
                unrealify_blocks(np.asarray(b2_b))
        a_b, b2_b = block_lanczos(
            jnp.asarray(hs), jnp.asarray(lsham), jnp.asarray(iz),
            jnp.asarray(cols), jnp.asarray(psi0), lld, hoh=hoh,
            hso=jnp.asarray(hso) if hso is not None else None,
            enim=jnp.asarray(enim) if enim is not None else None,
            iz_onsite=jnp.asarray(iz_onsite) if iz_onsite is not None
            else None)
        return np.asarray(a_b), np.asarray(b2_b)

    # ---- mesh branch (CPU and accelerator backends): chains sharded ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = int(np.prod(list(mesh.shape.values())))
    psi0_p, r0 = _pad_axis(np.asarray(psi0), 0, d)
    psi0_p[r0:] = psi0_p[0] if r0 else 0.0
    rep = NamedSharding(mesh, P())
    r_shard = NamedSharding(mesh, P("chains"))
    if eng is not None:
        # ms conv engine over the mesh: the chain axis arrives sharded
        # and GSPMD partitions the whole recursion accordingly
        g = jax.device_put(eng.embed(psi0_p), r_shard)
        a_b, b2_b = eng.block_lanczos(g, lld)
        return a_b[:, :r0], b2_b[:, :r0]
    if accel:
        # realified engine under the same pjit shardings as the CPU
        # branch: a multi-chip TPU run shards even without a conv stencil
        from ..ops.block_lanczos import realify_blocks, unrealify_blocks

        args = [jnp.asarray(realify_blocks(hs)),
                jnp.asarray(realify_blocks(lsham)), jnp.asarray(iz),
                jnp.asarray(cols), jnp.asarray(realify_blocks(psi0_p))]
        hso_j = (jnp.asarray(realify_blocks(hso)) if hso is not None
                 else jnp.zeros_like(args[0]))
        enim_j = (jnp.asarray(realify_blocks(enim)) if enim is not None
                  else jnp.zeros_like(args[1]))
    else:
        args = [jnp.asarray(hs), jnp.asarray(lsham), jnp.asarray(iz),
                jnp.asarray(cols), jnp.asarray(psi0_p)]
        hso_j = (jnp.asarray(hso) if hso is not None
                 else jnp.zeros_like(args[0]))
        enim_j = (jnp.asarray(enim) if enim is not None
                  else jnp.zeros_like(args[1]))
    izo_j = (jnp.asarray(iz_onsite) if iz_onsite is not None else args[2])

    def _bl(hs_, lsham_, iz_, cols_, psi0_, hso_, enim_, izo_):
        return block_lanczos(hs_, lsham_, iz_, cols_, psi0_, lld, hoh=hoh,
                             hso=hso_, enim=enim_, iz_onsite=izo_)

    fn = jax.jit(
        _bl,
        in_shardings=(rep, rep, rep, rep, r_shard, rep, rep, rep),
        out_shardings=(NamedSharding(mesh, P(None, "chains")),) * 2,
    )
    a_b, b2_b = fn(*args, hso_j, enim_j, izo_j)
    if accel:
        from ..ops.block_lanczos import unrealify_blocks

        return (unrealify_blocks(np.asarray(a_b))[:, :r0],
                unrealify_blocks(np.asarray(b2_b))[:, :r0])
    return np.asarray(a_b)[:, :r0], np.asarray(b2_b)[:, :r0]


def chebyshev_moments_auto(hs, lsham, iz, cols, psi0, lld, a, b, *,
                           hoh=False, hso=None, enim=None, iz_onsite=None,
                           starts=None, guard=True, cluster=None,
                           ms_local=None):
    """Chebyshev block moments over R chains, mesh-sharded when present.

    Returns host mu (2*lld+2, R, 18, 18).  Large clusters route through
    the active-set wavefront engine (izeroll, recursion.f90:2570-2577).
    ``guard=False`` for ij-pair chains: the reference's divergence check
    exists only in the per-atom ``chebyshev_recur_ll`` (:2594-2596), not
    in ``chebyshev_recur_ij`` — pair start blocks are superpositions
    whose signed block sums legitimately exceed the per-atom bound.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.chebyshev import chebyshev_moments, chebyshev_moments_split

    mesh = _mesh_for(np.asarray(psi0).shape[0])

    def _guard(mu):
        if not guard:
            if not np.isfinite(mu).all():
                from ..utils.logger import g_logger

                g_logger.fatal(
                    "Chebyshev moments did not converge. Check energy "
                    "limits energy_min and energy_max")
            return mu
        return _guard_ll(mu)

    def _guard_ll(mu):
        """Divergence guard (recursion.f90:2594-2596): the reference
        checks the SIGNED real sum of the newest even-moment block per
        rec atom against 1000 — moments blowing up mean the spectrum
        leaks outside the scaled energy window."""
        last = mu[-1].real.reshape(mu.shape[1], -1).sum(axis=1)
        if not np.isfinite(mu).all() or (last > 1.0e3).any():
            from ..utils.logger import g_logger

            g_logger.fatal(
                "Chebyshev moments did not converge. Check energy limits "
                "energy_min and energy_max")
        return mu

    accel = jax.default_backend() != "cpu"
    eng = None
    if accel and ms_local is not None:
        nmax = int(ms_local["nmax"])
        eng = _ms_engine_for(cluster, np.asarray(hs)[nmax:], lsham, hoh,
                             np.asarray(hso)[nmax:]
                             if hso is not None else None,
                             enim, local=ms_local)
    elif accel and (iz_onsite is None or np.array_equal(iz_onsite, iz)):
        eng = _ms_engine_for(cluster, hs, lsham, hoh, hso, enim)
    if eng is None:
        # collinear spin-sector split for the non-conv paths (see
        # block_lanczos_auto): the mu_n = psi0^H T_n(H) psi0 blocks
        # decouple exactly like the block recursion.  The divergence
        # guard must see the ASSEMBLED 18x18 block sums (the reference
        # sums the full block, recursion.f90:2594), so the sector calls
        # run unguarded except for the finite check.
        sec = _spin_sectors(hs, lsham, hso, enim, psi0, ms_local)
        if sec is not None:
            outs = [
                chebyshev_moments_auto(h_, l_, iz, cols, p_, lld, a, b,
                                       hoh=hoh, hso=o_, enim=e_,
                                       iz_onsite=iz_onsite,
                                       starts=starts, guard=False,
                                       cluster=cluster, ms_local=ml_)
                for (h_, l_, o_, e_, p_, ml_) in sec
            ]
            mu = _spin_assemble(outs[0], outs[1])
            if guard:
                last = mu[-1].real.reshape(mu.shape[1], -1).sum(axis=1)
                if (last > 1.0e3).any():
                    from ..utils.logger import g_logger

                    g_logger.fatal(
                        "Chebyshev moments did not converge. Check "
                        "energy limits energy_min and energy_max")
            return mu
    if eng is not None and getattr(eng, "_grid_shard", False):
        from ..ops.msconv_shard import chebyshev_moments_ms_sharded

        p0 = np.asarray(psi0)
        return _guard(chebyshev_moments_ms_sharded(
            eng, get_mesh(), eng.embed(p0), lld, a, b))
    if mesh is None:
        if eng is not None:
            p0 = np.asarray(psi0)
            try:
                return _guard(eng.chebyshev_moments(
                    eng.embed(p0), lld, a, b,
                    start_bbox=eng.start_bbox(p0)))
            except FatalError:
                raise
            except Exception as e:  # device OOM -> gather engine
                from ..utils.logger import g_logger

                g_logger.info(f"ms-conv engine failed at runtime "
                              f"({type(e).__name__}); falling back to "
                              "the gather engine")
        plan = _wavefront_plan(cols, np.asarray(psi0).shape[1] - 1,
                               psi0, lld, hoh, starts=starts,
                               kind="chebyshev")
        if plan is not None:
            from ..ops.wavefront import chebyshev_moments_wavefront

            if accel:
                from ..ops.block_lanczos import (
                    realify_blocks,
                    unrealify_blocks,
                )

                mu = chebyshev_moments_wavefront(
                    realify_blocks(hs), realify_blocks(lsham),
                    np.asarray(iz), np.asarray(cols),
                    realify_blocks(psi0), lld, a, b, plan, hoh=hoh,
                    hso=realify_blocks(hso) if hso is not None else None,
                    enim=(realify_blocks(enim)
                          if enim is not None else None),
                    iz_onsite=(np.asarray(iz_onsite)
                               if iz_onsite is not None else None))
                return _guard(unrealify_blocks(mu))
            return _guard(chebyshev_moments_wavefront(
                np.asarray(hs), np.asarray(lsham), np.asarray(iz),
                np.asarray(cols), np.asarray(psi0), lld, a, b, plan,
                hoh=hoh,
                hso=np.asarray(hso) if hso is not None else None,
                enim=np.asarray(enim) if enim is not None else None,
                iz_onsite=(np.asarray(iz_onsite)
                           if iz_onsite is not None else None)))
        if accel:
            return _guard(chebyshev_moments_split(
                hs, lsham, iz, cols, psi0, lld, a, b,
                hoh=hoh, hso=hso, enim=enim, iz_onsite=iz_onsite))
        mu = chebyshev_moments(
            jnp.asarray(hs), jnp.asarray(lsham), jnp.asarray(iz),
            jnp.asarray(cols), jnp.asarray(psi0), lld, a, b, hoh=hoh,
            hso=jnp.asarray(hso) if hso is not None else None,
            enim=jnp.asarray(enim) if enim is not None else None,
            iz_onsite=(jnp.asarray(iz_onsite)
                       if iz_onsite is not None else None))
        return _guard(np.asarray(mu))

    # ---- mesh branch (CPU and accelerator backends): chains sharded ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = int(np.prod(list(mesh.shape.values())))
    psi0_p, r0 = _pad_axis(np.asarray(psi0), 0, d)
    psi0_p[r0:] = psi0_p[0] if r0 else 0.0
    rep = NamedSharding(mesh, P())
    r_shard = NamedSharding(mesh, P("chains"))
    if eng is not None:
        g = jax.device_put(eng.embed(psi0_p), r_shard)
        return _guard(eng.chebyshev_moments(g, lld, a, b)[:, :r0])
    if accel:
        from ..ops.block_lanczos import realify_blocks, unrealify_blocks

        args = [jnp.asarray(realify_blocks(hs)),
                jnp.asarray(realify_blocks(lsham)), jnp.asarray(iz),
                jnp.asarray(cols), jnp.asarray(realify_blocks(psi0_p))]
        hso_j = (jnp.asarray(realify_blocks(hso)) if hso is not None
                 else jnp.zeros_like(args[0]))
        enim_j = (jnp.asarray(realify_blocks(enim)) if enim is not None
                  else jnp.zeros_like(args[1]))
    else:
        args = [jnp.asarray(hs), jnp.asarray(lsham), jnp.asarray(iz),
                jnp.asarray(cols), jnp.asarray(psi0_p)]
        hso_j = (jnp.asarray(hso) if hso is not None
                 else jnp.zeros_like(args[0]))
        enim_j = (jnp.asarray(enim) if enim is not None
                  else jnp.zeros_like(args[1]))
    izo_j = (jnp.asarray(iz_onsite) if iz_onsite is not None else args[2])

    def _ch(hs_, lsham_, iz_, cols_, psi0_, hso_, enim_, izo_):
        return chebyshev_moments(hs_, lsham_, iz_, cols_, psi0_, lld, a, b,
                                 hoh=hoh, hso=hso_, enim=enim_,
                                 iz_onsite=izo_)

    fn = jax.jit(
        _ch,
        in_shardings=(rep, rep, rep, rep, r_shard, rep, rep, rep),
        out_shardings=NamedSharding(mesh, P(None, "chains")),
    )
    mu = fn(*args, hso_j, enim_j, izo_j)
    if accel:
        return _guard(unrealify_blocks(np.asarray(mu))[:, :r0])
    return _guard(np.asarray(mu)[:, :r0])


def _rowshard_wanted(mesh, kk: int, b: int, c: int,
                     itemsize: int = 16) -> bool:
    """HBM threshold for the row-sharded layout: when the recursion
    state (a handful of (kk, B, C) wavefront buffers) would exceed the
    per-chip budget, the cluster rows must be sharded instead of
    replicated (the reference replicates the full cluster on every MPI
    rank — mpi.f90 keeps no halo — but a TPU chip has a hard HBM
    ceiling).  Budget override: ``RSLMTO_ROWSHARD_BYTES``."""
    if mesh is None:
        return False
    budget = int(os.environ.get("RSLMTO_ROWSHARD_BYTES", 8 << 30))
    state = 6 * kk * b * c * itemsize  # psi/pmn/hpsi + headroom
    return state > budget


def lanczos_auto(hs, iz, cols, psi0, lld, starts=None):
    """Scalar Haydock recursion over C chains (last axis), mesh-sharded
    when present.  Host in, host out: (a, b2) of shape (lld, C).

    Large clusters route through the active-set wavefront engine, or —
    when the wavefront state itself exceeds per-chip HBM — through the
    row-sharded ppermute-halo engine (``parallel/mesh.py
    lanczos_rowsharded``)."""
    import jax
    import jax.numpy as jnp

    from ..ops.lanczos import lanczos_coefficients

    mesh = _mesh_for(np.asarray(psi0).shape[2])
    if mesh is None:
        plan = _wavefront_plan(cols, np.asarray(psi0).shape[0] - 1,
                               psi0, lld, False, starts=starts)
        if plan is not None:
            from ..ops.wavefront import lanczos_coefficients_wavefront

            return lanczos_coefficients_wavefront(
                np.asarray(hs), np.asarray(iz), np.asarray(cols),
                np.asarray(psi0), lld, plan)
    if mesh is None:
        a, b2 = lanczos_coefficients(
            jnp.asarray(hs), jnp.asarray(iz), jnp.asarray(cols),
            jnp.asarray(psi0), lld)
        return np.asarray(a), np.asarray(b2)
    d = int(np.prod(list(mesh.shape.values())))
    p0 = np.asarray(psi0)
    kk = p0.shape[0] - 1
    if _rowshard_wanted(mesh, kk, p0.shape[1], p0.shape[2],
                        p0.dtype.itemsize):
        # HBM route: cluster rows sharded, ppermute halo SpMV, psum
        # reductions (mesh.py lanczos_rowsharded)
        from .mesh import lanczos_rowsharded

        kk_pad = -(-kk // d) * d
        iz_p = np.zeros(kk_pad, np.int32)
        iz_p[:kk] = np.asarray(iz)
        cols_np = np.asarray(cols)
        cols_p = np.full((kk_pad, cols_np.shape[1]), kk_pad, np.int32)
        cols_p[:kk] = np.where(cols_np >= kk, kk_pad, cols_np)
        psi_rows = np.zeros((kk_pad,) + p0.shape[1:], p0.dtype)
        psi_rows[:kk] = p0[:kk]
        a, b2 = lanczos_rowsharded(
            mesh, jnp.asarray(hs), jnp.asarray(iz_p),
            jnp.asarray(cols_p), jnp.asarray(psi_rows), lld)
        return np.asarray(a), np.asarray(b2)
    from .mesh import lanczos_sharded

    psi0_p, c0 = _pad_axis(p0, 2, d)
    a, b2 = lanczos_sharded(mesh, jnp.asarray(hs), jnp.asarray(iz),
                            jnp.asarray(cols), jnp.asarray(psi0_p), lld)
    return np.asarray(a)[:, :c0], np.asarray(b2)[:, :c0]
