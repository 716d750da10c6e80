"""Bulk calculation pipeline: geometry -> Hamiltonian -> recursion -> LDOS.

Mirrors the reference's ``pre_processing='bravais'`` setup
(``calculation.f90 pre_processing_bravais`` :550-623) followed by the pieces
of ``self%run`` (``self.f90`` :676-764) implemented so far.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..atoms.potential import SymbolicAtom
from ..config import JobConfig
from ..geometry import (
    bravais_cluster,
    neighbor_map,
    primitive_cell,
    sbar_for_cluster,
)
from ..ops.lanczos import (
    lanczos_coefficients,
    lanczos_coefficients_split,
    scalar_start_vectors,
    split_complex,
    split_vector,
)
from ..ops.ldos import orbital_density
from ..physics.energy_mesh import EnergyMesh
from ..physics.hamiltonian import HamiltonianBlocks, build_bulkham
from ..utils.logger import g_logger
from ..utils.timer import g_timer


@dataclass
class BulkSystem:
    cfg: JobConfig
    workdir: str = "."
    cluster: object = None
    atoms: List[SymbolicAtom] = field(default_factory=list)
    sbars: Optional[list] = None
    sbarvecs: Optional[list] = None
    ham: Optional[HamiltonianBlocks] = None
    emesh: Optional[EnergyMesh] = None

    @classmethod
    def build(cls, cfg: JobConfig, workdir: str = ".") -> "BulkSystem":
        sys = cls(cfg=cfg, workdir=workdir)
        lat = cfg.lattice
        # historical defaults when &lattice omits ct / r2 (the reference's
        # commented-out build_data fallback ct = alat + 0.1, r2 = ct^2 —
        # inputs like example/exchange/bccFe rely on them)
        if lat.ct[0] == 0.0:
            lat.ct[:] = lat.alat + 0.1
        if lat.r2 == 0.0:
            lat.r2 = float(lat.ct[0]) ** 2
        with g_timer.section("geometry"):
            # crystal_sym='file' reads the general user cell from a
            # lattice.nml sidecar next to the input file (build_data
            # 'file' branch, lattice.f90:925 -> build_from_lattice :660)
            lattice_file = os.path.join(
                os.path.dirname(os.path.abspath(cfg.control.fname or ".")),
                "lattice.nml")
            cell = primitive_cell(lat.crystal_sym, lat.celldm,
                                  lattice_file=lattice_file)
            cl = bravais_cluster(
                cell,
                alat=lat.alat,
                rc=lat.rc,
                ndim=lat.ndim,
                npe=lat.npe,
                wav=lat.wav,
                calctype=cfg.control.calctype,
                pbc=bool(lat.pbc),
                pbc_dims=(lat.n1, lat.n2, lat.n3),
                pbc_wrap=(bool(lat.b1), bool(lat.b2), bool(lat.b3)),
            )
            cl._ct1 = float(lat.ct[0])
            if cell.iu is not None and cfg.control.calctype == "B":
                # bookkeeping straight from the user lattice.nml
                cl.iu = cell.iu.copy()
                cl.ib = cell.ib.copy()
                cl.irec = cell.irec.copy()
                cl.nrec = cell.nrec
                cl.atlist = np.concatenate([cl.ib, cl.irec]) \
                    if cl.nbulk else cl.irec.copy()
                cl.ntype = max(cl.ntype, int(cl.iz.max()))
            pre = (cfg.calculation.pre_processing or "").strip()
            if pre == "newclusurf":
                # impurity embedded in a surface slab
                # (pre_processing_newclusurf: bravais -> build_surf_full
                # -> newclu, calculation.f90 :848-858)
                from ..geometry.cluster import newclu
                from ..geometry.surface import build_surf_full

                cl = build_surf_full(cl, lat.surftype, int(lat.nlay),
                                     cell.ntot)
                cl = newclu(cl, lat.inclu, cell.ntot)
            elif cfg.control.calctype == "I":
                from ..geometry.cluster import newclu

                cl = newclu(cl, lat.inclu, cell.ntot)
            elif cfg.control.calctype == "S":
                from ..geometry.surface import build_surf_full

                cl = build_surf_full(cl, lat.surftype, int(lat.nlay),
                                     cell.ntot)
            neighbor_map(cl, ct1=float(lat.ct[0]))
        g_logger.info(
            f"cluster built: kk={cl.kk}, nnmax={cl.nn.shape[1]}, "
            f"ntype={cl.ntype}"
        )
        with g_timer.section("structure-constants"):
            sys.sbars, sys.sbarvecs = sbar_for_cluster(
                cl.cr_ang, cl.iu, cl.wav, lat.r2
            )
        sys.cluster = cl
        with g_timer.section("element-db"):
            for label in cfg.atoms.labels:
                sys.atoms.append(
                    SymbolicAtom.from_file(label, cfg.atoms.database or workdir)
                )
        sys.emesh = EnergyMesh.build(cfg.energy)
        return sys

    # ------------------------------------------------------------------
    def build_hamiltonian(self) -> HamiltonianBlocks:
        """``run_recursion`` setup part: build_pot + build_bulkham.

        When ``freeze_ham`` is set (PAOFLOW-imported Hamiltonians), the
        existing blocks are kept as-is.
        """
        if getattr(self, "freeze_ham", False) and self.ham is not None:
            return self.ham
        for at in self.atoms:
            at.potential.build_pot()
        with g_timer.section("build-bulkham"):
            self.ham = build_bulkham(
                self.cluster,
                self.atoms,
                self.sbars,
                self.sbarvecs,
                hoh=self.cfg.hamiltonian.hoh,
                with_soc=self.cfg.control.nsp in (2, 4),
            )
        return self.ham

    # ------------------------------------------------------------------
    def run_lanczos(self):
        """Scalar Haydock recursion for all rec atoms (nsp=1 path).

        Returns (a, b2) with shape (lld, 18, nrec): per-orbital chains in the
        reference's ordering (9 up-spin then 9 down-spin orbitals).
        """
        import jax

        cl = self.cluster
        hb = self.ham
        lld = self.cfg.control.lld
        rec_atoms = [int(j) - 1 for j in cl.irec]
        # TPU v5e has no native complex128: prefer the df64 exact-chunk
        # conv-stencil engine (MXU-native, ~1e-13 vs complex128; see
        # ops/stencil_conv.py), falling back to the XLA-emulated-f64
        # split-complex path for clusters without a stencil embedding
        use_split = jax.default_backend() != "cpu"
        conv_st = None
        if use_split and hb.ee.shape[0] == 1 \
                and not os.environ.get("RSLMTO_NO_CONV"):
            try:
                from ..ops.stencil_conv import build_conv_stencil

                conv_st = build_conv_stencil(cl)
            except (ValueError, RuntimeError, AssertionError):
                conv_st = None  # multi-site cell / non-grid cluster
        with g_timer.section("recursion"):
            a_list = []
            b_list = []
            for s in (0, 1):  # spin channels are decoupled for nsp=1
                blk = hb.ee[:, :, 9 * s : 9 * (s + 1), 9 * s : 9 * (s + 1)]
                psi0 = scalar_start_vectors(cl.kk, rec_atoms)
                if conv_st is not None:
                    hs_split = np.asarray(split_complex(blk[0]))
                    # preferred: the fused Pallas flat engine (in-kernel
                    # df64 bucket recombination + masking, ~1.4x the XLA
                    # conv lowering); radius-1 stencils only
                    a = None
                    if not os.environ.get("RSLMTO_NO_PALLAS"):
                        from ..ops import pallas_conv as pc

                        try:
                            # the documented ValueError sources: wide
                            # stencil / oversized box during packing
                            fs = pc.build_flat_stencil(conv_st)
                            wt, hsc, dxs, cshift = pc.pack_flat_kernel(
                                hs_split, conv_st)
                        except ValueError as e:
                            fs = None
                            g_logger.info(
                                "Pallas flat engine unavailable "
                                f"({e}); using conv-stencil engine")
                        if fs is not None:
                            p0 = pc.flat_start_vectors(
                                fs, rec_atoms, 18, orbitals=range(9))
                            a, b2 = pc.lanczos_coefficients_flat_df64(
                                wt, hsc, fs.mask, p0, lld, dxs=dxs,
                                colshifts=cshift)
                    if a is None:
                        from ..ops.stencil_conv import (
                            conv_start_vectors,
                            lanczos_coefficients_conv_df64,
                            pack_conv_kernel_df64,
                        )

                        w, h_scale, radius = pack_conv_kernel_df64(
                            hs_split, conv_st.dcells)
                        psi0_ds = conv_start_vectors(
                            conv_st, rec_atoms, 18, orbitals=range(9))
                        a, b2 = lanczos_coefficients_conv_df64(
                            w, h_scale, jnp.asarray(conv_st.mask), psi0_ds,
                            lld, radius=radius)
                elif use_split:
                    a, b2 = lanczos_coefficients_split(
                        split_complex(blk),
                        jnp.asarray(hb.iz),
                        jnp.asarray(hb.cols),
                        split_vector(psi0),
                        lld,
                    )
                else:
                    # chain-sharded over the mesh when >1 device (the MPI
                    # atom partition analogue, mpi.f90:32-58)
                    from ..parallel.dispatch import lanczos_auto

                    a, b2 = lanczos_auto(blk, hb.iz, hb.cols, psi0, lld)
                a_list.append(np.asarray(a))
                b_list.append(np.asarray(b2))
        nrec = len(rec_atoms)
        # chains are laid out c = atom*9 + orbital; merge spins -> 18
        a = np.zeros((lld, 18, nrec))
        b2 = np.zeros((lld, 18, nrec))
        for ia in range(nrec):
            a[:, 0:9, ia] = a_list[0][:, ia * 9 : (ia + 1) * 9]
            a[:, 9:18, ia] = a_list[1][:, ia * 9 : (ia + 1) * 9]
            b2[:, 0:9, ia] = b_list[0][:, ia * 9 : (ia + 1) * 9]
            b2[:, 9:18, ia] = b_list[1][:, ia * 9 : (ia + 1) * 9]
        return a, b2

    # ------------------------------------------------------------------

    def _cached_psi0(self, kk: int, rec_atoms):
        """Identity start blocks, reused across SCF iterations so the
        dispatch device-transfer cache hits (the array is constant —
        only the Hamiltonian changes per iteration)."""
        from ..ops.block_lanczos import block_start_vectors

        key = (kk, tuple(rec_atoms))
        cached = getattr(self, "_psi0_block", None)
        if cached is None or cached[0] != key:
            self._psi0_block = (key, block_start_vectors(kk, rec_atoms))
        return self._psi0_block[1]

    # ------------------------------------------------------------------
    def _spmv_tables(self):
        """Block-row tables for the SpMV: combined [hall; ee] rows with
        per-atom indices in the impurity-local zone, plain per-type rows
        otherwise.  Returns (blocks, blocks_o, iz_rows, iz_species)."""
        hb = self.ham
        if hb.blocks is not None:
            return hb.blocks, hb.blocks_o, hb.iz_eff, hb.iz
        return hb.ee, hb.eeo, hb.iz, hb.iz

    # ------------------------------------------------------------------
    def run_block(self):
        """Block-Lanczos recursion (``recur_b``) for all rec atoms.

        Returns (a_b, b2_b) of shape (lld, nrec, 18, 18).
        """
        from ..ops.block_lanczos import block_lanczos, block_start_vectors

        cl = self.cluster
        hb = self.ham
        lld = self.cfg.control.lld
        hoh = self.cfg.hamiltonian.hoh
        rec_atoms = [int(j) - 1 for j in cl.irec]
        ntype = hb.ee.shape[0]
        lsham = hb.lsham if hb.lsham is not None else np.zeros(
            (ntype, 18, 18), dtype=np.complex128
        )
        blocks, blocks_o, iz_rows, iz_sp = self._spmv_tables()
        if self.cfg.hamiltonian.local_axis:
            # rotate the full Hamiltonian to each rec atom's moment frame
            # before its recursion (recursion.f90 recur_b :1830-1833 +
            # hamiltonian rotate_to_local_axis :2442-2462); per-atom
            # batching is lost, matching the reference's serial loop
            from ..physics.harmonics import rotmag_loc

            a_parts, b_parts = [], []
            for n, ja in enumerate(rec_atoms):
                mom = self.atoms[int(cl.iz[ja]) - 1].potential.mom
                rb = rotmag_loc(blocks, mom)
                rl = rotmag_loc(lsham, mom)
                psi0 = block_start_vectors(cl.kk, [ja])
                a_b, b2_b = block_lanczos(
                    jnp.asarray(rb),
                    jnp.asarray(rl),
                    jnp.asarray(iz_rows),
                    jnp.asarray(hb.cols),
                    jnp.asarray(psi0),
                    lld,
                    hoh=hoh,
                    hso=(jnp.asarray(rotmag_loc(blocks_o, mom))
                         if hoh else None),
                    enim=(jnp.asarray(rotmag_loc(hb.enim, mom))
                          if hoh else None),
                    iz_onsite=jnp.asarray(iz_sp),
                )
                a_parts.append(np.asarray(a_b))
                b_parts.append(np.asarray(b2_b))
            return (np.concatenate(a_parts, axis=1),
                    np.concatenate(b_parts, axis=1))
        psi0 = self._cached_psi0(cl.kk, rec_atoms)
        with g_timer.section("block-recursion"):
            # dispatch: TPU realified engine / CPU complex128, chain-
            # sharded over the mesh when >1 device (recur_b's MPI atom
            # partition, recursion.f90:1816)
            from ..parallel.dispatch import block_lanczos_auto

            ms_local = None if hb.blocks is None else {
                "nmax": cl.nmax, "cols": hb.cols, "hall": hb.hall,
                "hallo": hb.hallo}
            a_b, b2_b = block_lanczos_auto(
                blocks, lsham, iz_rows, hb.cols, psi0, lld,
                hoh=hoh, hso=blocks_o if hoh else None,
                enim=hb.enim if hoh else None, iz_onsite=iz_sp,
                cluster=cl, ms_local=ms_local,
            )
        return a_b, b2_b

    # ------------------------------------------------------------------
    def run_chebyshev(self, emesh):
        """Block Chebyshev/KPM moments (``chebyshev_recur``).

        Returns mu of shape (2*lld+2, nrec, 18, 18).
        """
        from ..ops.block_lanczos import block_start_vectors
        from ..ops.chebyshev import chebyshev_moments

        cl = self.cluster
        hb = self.ham
        lld = self.cfg.control.lld
        hoh = self.cfg.hamiltonian.hoh
        rec_atoms = [int(j) - 1 for j in cl.irec]
        ntype = hb.ee.shape[0]
        lsham = hb.lsham if hb.lsham is not None else np.zeros(
            (ntype, 18, 18), dtype=np.complex128
        )
        a = (emesh.energy_max - emesh.energy_min) / (2.0 - 0.3)
        b = (emesh.energy_max + emesh.energy_min) / 2.0
        blocks, blocks_o, iz_rows, iz_sp = self._spmv_tables()
        psi0 = self._cached_psi0(cl.kk, rec_atoms)
        with g_timer.section("chebyshev-recursion"):
            # dispatch: backend + mesh chain sharding (chebyshev_recur's
            # MPI atom partition)
            from ..parallel.dispatch import chebyshev_moments_auto

            ms_local = None if hb.blocks is None else {
                "nmax": cl.nmax, "cols": hb.cols, "hall": hb.hall,
                "hallo": hb.hallo}
            mu = chebyshev_moments_auto(
                blocks, lsham, iz_rows, hb.cols, psi0, lld, a, b,
                hoh=hoh, hso=blocks_o if hoh else None,
                enim=hb.enim if hoh else None, iz_onsite=iz_sp,
                cluster=cl, ms_local=ms_local,
            )
        return np.asarray(mu)

    # ------------------------------------------------------------------
    def ldos(self, a: np.ndarray, b2: np.ndarray):
        """Per-atom per-orbital LDOS on the energy mesh (``dos%density``).

        Returns tdens of shape (nrec, 18, npts).
        """
        em = self.emesh
        nrec = a.shape[2]
        out = np.zeros((nrec, 18, em.npts))
        with g_timer.section("ldos"):
            for ia in range(nrec):
                pot = self.atoms[int(self.cluster.iz[ia]) - 1].potential
                tdens, _, _ = orbital_density(
                    a[:, :, ia], b2[:, :, ia], em.ene, pot.dw_l, pot.cshi
                )
                out[ia] = tdens
        return out
