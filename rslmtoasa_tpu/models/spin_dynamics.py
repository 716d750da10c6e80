"""Atomistic spin dynamics with SCF-recomputed effective fields.

Implements the reference ``processing='sd'`` loop
(``spin_dynamics.f90 sd_run`` :410-457): each time step runs a FULL
self-consistency cycle, extracts the magnetic force/torque on every moment
(``bands.f90 calculate_magnetic_torques`` :1280-1340: the d-channel
longitudinal field I = pref_0 m^(0) - pref_1 m^(1) from the spin-split
potential parameters), advances the moments with the LLG Euler
predictor (``asd_pred_euler`` :353-380) or the Depondt-Mertens rotation
integrator (``abspinlib/depondt.f90``), and streams a LAMMPS trajectory.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..utils.logger import g_logger
from .bulk import BulkSystem
from .scf import SelfConsistency

GAMA = 1.76e11  # gyromagnetic ratio (abspinlib Constants)
K_BOLT = 1.380649e-23
MUB = 9.274009994e-24
RY2TESLA = 2.35051754997e5


@dataclass
class SDParams:
    dt: float = 1.0e-16
    alpha: float = 0.05
    asd_step: int = 10
    sd_temp: float = 0.0
    integrator: str = "euler"

    @classmethod
    def from_namelists(cls, nml) -> "SDParams":
        p = cls()
        g = nml.get("sd")
        if g is None:
            return p
        for k in "dt alpha asd_step sd_temp integrator".split():
            if g.has(k):
                setattr(p, k, g.get_scalar(k, getattr(p, k)))
        return p


def magnetic_torques(atoms, iz_rec) -> np.ndarray:
    """Effective field I_loc per rec atom in Tesla
    (``calculate_magnetic_torques``; mom0/mom1 must be current)."""
    out = np.zeros((3, len(iz_rec)))
    for na, isp in enumerate(iz_rec):
        p = atoms[isp].potential
        d, up, dw = 2, 0, 1
        pref_0 = (p.c[d, up] * p.srdel[d, dw] / p.srdel[d, up]
                  - p.c[d, dw] * p.srdel[d, up] / p.srdel[d, dw])
        pref_1 = (p.srdel[d, dw] / p.srdel[d, up]
                  - p.srdel[d, up] / p.srdel[d, dw])
        i_loc = pref_0 * p.mom0 - pref_1 * p.mom1
        out[:, na] = i_loc * RY2TESLA
    return out


def depondt_evolve_first(lam, beff, emom, mmom, dt, temp, rng):
    """Depondt-Mertens predictor rotation (depondt.f90 :25-165).

    Returns (emom_new, b2eff, btherm).  All arrays (3, N).
    """
    n = emom.shape[1]
    btherm = rng.standard_normal((3, n))
    dp = (2.0 * lam * K_BOLT) / (dt * GAMA * MUB)
    sigma = np.sqrt(dp * temp / mmom)
    btherm = btherm * sigma[None, :]
    bloc = beff + btherm
    # transverse damping term: b + lam * (e x b)
    bdup = bloc + lam * np.cross(emom.T, bloc.T).T
    lldamp = 1.0 / (1.0 + lam**2)
    bnorm = np.linalg.norm(bdup, axis=0) + 1.0e-15
    h = bdup / bnorm
    v = bnorm * dt * GAMA * lldamp
    cosv = np.cos(v)
    sinv = np.sin(v)
    u = 1.0 - cosv
    e = emom
    he = (h * e).sum(axis=0)
    e_new = (e * cosv[None, :]
             + h * (he * u)[None, :]
             + np.cross(h.T, e.T).T * sinv[None, :])
    e_new /= np.linalg.norm(e_new, axis=0)[None, :]
    return e_new, bdup, btherm


def depondt_evolve_second(lam, beff, b2eff, emom, dt):
    """Corrector rotation with the averaged field (depondt.f90 :169-265)."""
    bloc = beff
    bdup = bloc + lam * np.cross(emom.T, bloc.T).T
    bdup = 0.5 * (bdup + b2eff)
    lldamp = 1.0 / (1.0 + lam**2)
    bnorm = np.linalg.norm(bdup, axis=0) + 1.0e-15
    h = bdup / bnorm
    v = bnorm * dt * GAMA * lldamp
    cosv = np.cos(v)
    sinv = np.sin(v)
    u = 1.0 - cosv
    e = emom
    he = (h * e).sum(axis=0)
    e_new = (e * cosv[None, :]
             + h * (he * u)[None, :]
             + np.cross(h.T, e.T).T * sinv[None, :])
    e_new /= np.linalg.norm(e_new, axis=0)[None, :]
    return e_new


class SpinDynamics:
    def __init__(self, sys: BulkSystem, workdir: str = ".", seed: int = 1234):
        self.sys = sys
        self.cfg = sys.cfg
        self.workdir = workdir
        self.params = SDParams.from_namelists(sys.cfg.namelists)
        self.rng = np.random.default_rng(seed)
        self.scf = SelfConsistency(sys, workdir)

    # ------------------------------------------------------------------
    def run(self):
        p = self.params
        sys = self.sys
        iz_rec = self.scf.iz_rec
        na = len(iz_rec)
        g_logger.info(
            f"spin dynamics: {p.asd_step} steps, dt={p.dt}, "
            f"alpha={p.alpha}, T={p.sd_temp}"
        )
        self.scf.run()
        mom_prev = np.stack(
            [sys.atoms[isp].potential.mom0 for isp in iz_rec], axis=1
        )
        timestep = 0.0
        traj_path = os.path.join(self.workdir, "output.lammpstrj")
        if os.path.exists(traj_path):
            os.remove(traj_path)
        for step in range(1, p.asd_step + 1):
            timestep += p.dt
            g_logger.info(f"spin dynamics step {step}")
            self.scf.run()
            field = -magnetic_torques(sys.atoms, iz_rec)
            mom_in = mom_prev.copy()
            emom = np.zeros((3, na))
            if p.integrator == "depondt":
                # Depondt-Mertens rotation predictor-corrector
                # (abspinlib/depondt.f90; norm-preserving by
                # construction).  The effective field is the SCF field
                # of this step for both stages.
                mmom = np.linalg.norm(mom_in, axis=0)
                e_in = mom_in / mmom[None, :]
                e_pred, b2eff, _ = depondt_evolve_first(
                    p.alpha, field, e_in, mmom, p.dt, p.sd_temp,
                    self.rng,
                )
                emom = depondt_evolve_second(
                    p.alpha, field, b2eff, e_pred, p.dt
                )
                for i in range(na):
                    sys.atoms[iz_rec[i]].potential.mom0 = \
                        emom[:, i] * mmom[i]
            else:
                # Euler LLG predictor (asd_pred_euler :353-380)
                for i in range(na):
                    m = mom_in[:, i]
                    t1 = -GAMA * np.cross(m, field[:, i])
                    t2 = -p.alpha * GAMA * np.cross(
                        m, np.cross(m, field[:, i])
                    )
                    dm = t1 + t2
                    m_new = m + p.dt * dm
                    sys.atoms[iz_rec[i]].potential.mom0 = m_new
                    emom[:, i] = m_new / np.linalg.norm(m_new)
            for i in range(na):
                sys.atoms[iz_rec[i]].potential.mom = emom[:, i]
                mom_prev[:, i] = sys.atoms[iz_rec[i]].potential.mom0
            self._write_traj(emom, timestep)
        return mom_prev

    # ------------------------------------------------------------------
    def _write_traj(self, spins: np.ndarray, timestep: float):
        cl = self.sys.cluster
        na = spins.shape[1]
        path = os.path.join(self.workdir, "output.lammpstrj")
        with open(path, "a") as fh:
            fh.write("ITEM: TIMESTEP\n")
            fh.write(f" {timestep}\n")
            fh.write("ITEM: NUMBER OF ATOMS\n")
            fh.write(f" {na}\n")
            fh.write("ITEM: BOX BOUNDS xy xz yz\n")
            fh.write("    1.000000    0.000000    0.000000\n")
            fh.write("    0.000000    1.000000    0.000000\n")
            fh.write("    0.000000    0.000000    1.000000\n")
            fh.write("ITEM: ATOMS type x y z vx vy vz\n")
            for i in range(na):
                x, y, z = cl.cr[i]
                fh.write(
                    f"{int(cl.iz[i]):4d}"
                    + "".join(f"{v:12.4f}" for v in (x, y, z, *spins[:, i]))
                    + "\n"
                )
