"""Exchange-coupling post-processing: Jij, DMI vector Dij, anisotropy Aij.

Implements the reference ``post_processing='exchange'`` pipeline
(``calculation.f90 post_processing_exchange`` :816-951):

* per ij-pair block recursion with the 4-start-vector trick
  (``recur_b_ij`` :1655-1745: (i+j), (i-j), (i+ij), (i-ij) superpositions),
* intersite Green functions Gij/Gji from the 4 chains and their spin
  decomposition (``green.f90 calculate_intersite_gf`` :425-470),
* LKAG formula: energy traces of d_i Gij d_j Gji combinations
  (``exchange.f90 calculate_exchange`` :1437-1560 with ``dGdG_Jnc``/
  ``dGdG_Dnc``/``dGdG_Anc`` :933-1030), Fermi-weighted Simpson integration,
* outputs ``jij.out``, ``dij.out``, ``aij.out`` in the reference's column
  layout (values in mRy: x 1e3 / 4 pi).

The pair batch (4 x njij chains) is the natural TPU fan-out axis.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import JobConfig
from ..ops.block_lanczos import block_lanczos, zsqr
from ..physics.greens import bgreen, get_terminf
from ..physics.energy_mesh import EnergyMesh
from ..utils.logger import g_logger
from ..utils.timer import g_timer
from .bulk import BulkSystem
from .scf import ANG2AU


def pair_start_vectors(kk: int, pairs: np.ndarray) -> np.ndarray:
    """4 start blocks per (i, j) pair (``recur_b_ij`` :1655-1712).

    pairs: (njij, 2) 0-based cluster indices.  Returns
    psi0 (4*njij, kk+1, 18, 18).
    """
    c = 1.0 / np.sqrt(2.0)
    signs = [(c, c), (c, -c), (c, 1j * c), (c, -1j * c)]
    r = 4 * len(pairs)
    psi0 = np.zeros((r, kk + 1, 18, 18), dtype=np.complex128)
    for p, (i, j) in enumerate(pairs):
        for reci, (asign, bsign) in enumerate(signs):
            if i == j:
                if reci == 0:
                    asign = bsign = 1.0
                else:
                    continue  # reference cycles (chains stay zero)
            idx = p * 4 + reci
            # layout (R, kk+1, 18, 18) = (chain, site, orb, orb);
            # assignment (not +=) matches the reference's overwrite when i==j
            psi0[idx, i, :, :] = asign * np.eye(18)
            psi0[idx, j, :, :] = bsign * np.eye(18)
    return psi0


def simpson_f_fermi(y: np.ndarray, ene: np.ndarray, ef: float,
                    npts: int) -> float:
    """Fermi-weighted Simpson integral (math.f90 ``simpson_f`` :1600-1633,
    fermi=True branch, T=0 limit kbT=1e-15)."""
    kbt = 0.633362019e-5 * 0.0 + 1.0e-15
    h = ene[1] - ene[0]
    with np.errstate(over="ignore"):
        f = 1.0 / (np.exp((ene - ef) / kbt) + 1.0)
    total = 0.0
    # Fortran: do I = 2, NPTS+9, 2 over the full extended mesh
    i = np.arange(2, npts + 10, 2)
    i = i[i + 1 <= ene.shape[0]]
    yf = y * f
    total = np.sum(yf[i - 2] + 4.0 * yf[i - 1] + yf[i])
    return float(h * total / 3.0)


class ExchangeCalculation:
    def __init__(self, sys: BulkSystem, pairs_1based: np.ndarray,
                 workdir: str = "."):
        self.sys = sys
        self.cfg = sys.cfg
        self.workdir = workdir
        self.pairs = np.asarray(pairs_1based, dtype=np.int64) - 1  # 0-based

    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        sys = self.sys
        cl = sys.cluster
        lld = cfg.control.lld
        emesh = EnergyMesh.build(cfg.energy)

        # build_pot -> Hamiltonian from file parameters; predls afterwards
        # feeds d_matrix (post_processing_exchange ordering)
        sys.build_hamiltonian()
        for at in sys.atoms:
            at.potential.predls(cl.wav * ANG2AU)

        hb = sys.ham
        ntype = hb.ee.shape[0]
        lsham = hb.lsham if hb.lsham is not None else np.zeros(
            (ntype, 18, 18), dtype=np.complex128
        )
        psi0 = pair_start_vectors(cl.kk, self.pairs)
        with g_timer.section("pair-recursion"):
            a_b, b2_b = block_lanczos(
                jnp.asarray(hb.ee),
                jnp.asarray(lsham),
                jnp.asarray(hb.iz),
                jnp.asarray(hb.cols),
                jnp.asarray(psi0),
                lld,
                hoh=cfg.hamiltonian.hoh,
                hso=jnp.asarray(hb.eeo) if cfg.hamiltonian.hoh else None,
                enim=jnp.asarray(hb.enim) if cfg.hamiltonian.hoh else None,
            )
        a_b = np.asarray(a_b)
        b_b = zsqr(np.asarray(b2_b))

        with g_timer.section("intersite-gf"):
            gi, gj = self._intersite_gf(a_b, b_b, emesh)

        with g_timer.section("jij-integrals"):
            results = self._lkag(gi, gj, emesh)
        self._write_outputs(results)
        return results

    # ------------------------------------------------------------------
    def _intersite_gf(self, a_b, b_b, emesh):
        """Gij/Gji spin components per pair: returns two dicts of
        (njij, 9, 9, NE) arrays keyed by ('n','x','y','z')."""
        cfg = self.cfg
        njij = len(self.pairs)
        ne = emesh.npts
        comps_i = {k: np.zeros((njij, 9, 9, ne), np.complex128)
                   for k in "nxyz"}
        comps_j = {k: np.zeros((njij, 9, 9, ne), np.complex128)
                   for k in "nxyz"}
        for p, (i, j) in enumerate(self.pairs):
            sl = slice(4 * p, 4 * p + 4)
            a4 = a_b[:, sl]
            b4 = b_b[:, sl]
            a_inf, b_inf = get_terminf(a4, b4)
            g4 = np.stack([
                bgreen(a4[:, n], b4[:, n], a_inf[n], b_inf[n], emesh.ene,
                       sym_term=cfg.control.sym_term)
                for n in range(4)
            ])  # (4, 18, 18, NE)
            if i == j:
                gij = g4[0]
                gji = g4[0]
            else:
                diff = (1.0 / 1j) * (g4[2] - g4[3])
                gij = 0.5 * (g4[0] - g4[1] + diff)
                gji = 0.5 * (g4[0] - g4[1] - diff)
            for (comps, g) in ((comps_i, gij), (comps_j, gji)):
                uu = g[0:9, 0:9]
                dd = g[9:18, 9:18]
                ud = g[0:9, 9:18]
                du = g[9:18, 0:9]
                comps["n"][p] = 0.5 * (uu + dd)
                comps["z"][p] = 0.5 * (uu - dd)
                comps["y"][p] = 0.5 * (1j * ud - 1j * du)
                comps["x"][p] = 0.5 * (ud + du)
        return comps_i, comps_j

    # ------------------------------------------------------------------
    def _lkag(self, gi, gj, emesh) -> List[dict]:
        cl = self.sys.cluster
        ne = emesh.npts
        results = []
        for p, (i, j) in enumerate(self.pairs):
            it = int(cl.iz[i]) - 1
            jt = int(cl.iz[j]) - 1
            pot_i = self.sys.atoms[it].potential
            pot_j = self.sys.atoms[jt].potential
            # d matrices for all energies: diagonal 9-vector per energy
            di = np.stack([np.diag(pot_i.d_matrix(e)) for e in emesh.ene])
            dj = np.stack([np.diag(pot_j.d_matrix(e)) for e in emesh.ene])
            # work in (NE, 9, 9)
            gjx = {k: gj[k][p].transpose(2, 0, 1) for k in "nxyz"}
            gix = {k: gi[k][p].transpose(2, 0, 1) for k in "nxyz"}

            def dg(d, g):  # (NE,9) diag @ (NE,9,9)
                return d[:, :, None] * g

            # Jij: tr[ d_i G^n_ij d_j G^n_ji - sum_k d_i G^k_ij d_j G^k_ji ]
            jmat = np.matmul(dg(di, gix["n"]), dg(dj, gjx["n"]))
            for k in "xyz":
                jmat = jmat - np.matmul(dg(di, gix[k]), dg(dj, gjx[k]))
            jtot = np.imag(np.trace(jmat, axis1=1, axis2=2))
            jij = simpson_f_fermi(jtot, emesh.ene, emesh.fermi, emesh.nv1)
            jij *= 1.0e3 / 4.0 / np.pi

            # DMI
            dmi = np.zeros(3)
            for kidx, k in enumerate("xyz"):
                t3 = np.matmul(dg(di, gix["n"]), dg(dj, gjx[k]))
                t4 = np.matmul(dg(dj, gjx["n"]), dg(di, gix[k]))
                y = np.real(np.trace(t3 - t4, axis1=1, axis2=2))
                dmi[kidx] = simpson_f_fermi(y, emesh.ene, emesh.fermi,
                                            emesh.nv1)
            dmi *= 1.0e3 / 4.0 / np.pi

            # anisotropy tensor
            aij = np.zeros((3, 3))
            for kidx, k in enumerate("xyz"):
                for lidx, l in enumerate("xyz"):
                    t3 = np.matmul(dg(di, gix[k]), dg(dj, gjx[l]))
                    t4 = np.matmul(dg(dj, gjx[k]), dg(di, gix[l]))
                    y = np.imag(np.trace(0.5 * (t3 + t4), axis1=1, axis2=2))
                    aij[kidx, lidx] = simpson_f_fermi(
                        y, emesh.ene, emesh.fermi, emesh.nv1
                    )
            aij *= 1.0e3 / 4.0 / np.pi

            results.append({
                "i": int(i), "j": int(j),
                "iz_i": int(cl.iz[i]), "iz_j": int(cl.iz[j]),
                "rij": cl.cr[j] - cl.cr[i],
                "dist": float(np.linalg.norm(cl.cr[i] - cl.cr[j])),
                "jij": jij, "dmi": dmi, "aij": aij,
            })
            g_logger.info(f"Jij pair ({i+1},{j+1}): {jij:.6f} mRy")
        return results

    # ------------------------------------------------------------------
    def _write_outputs(self, results: List[dict]):
        with open(os.path.join(self.workdir, "jij.out"), "w") as f20, \
                open(os.path.join(self.workdir, "dij.out"), "w") as f30, \
                open(os.path.join(self.workdir, "aij.out"), "w") as f40:
            for r in results:
                head = (f"{r['iz_i']:8d}{r['iz_j']:8d}  "
                        + "".join(f"{x:12.6f}" for x in r["rij"]) + "  ")
                f20.write(head + f"{r['jij']:12.6f} {r['dist']:12.6f}\n")
                f30.write(head + "".join(f"{x:12.6f}" for x in r["dmi"])
                          + f" {r['dist']:12.6f}\n")
                # Fortran writes aij in column-major order
                f40.write(head
                          + "".join(f"{x:12.6f}" for x in r["aij"].T.ravel())
                          + f" {r['dist']:12.6f}\n")
