"""Exchange-correlation potentials on the radial mesh.

Re-implements the reference ``source/xc.f90`` XCPOT dispatch for the LDA
functionals (txc 1 von Barth-Hedin [default], 2 Slater X-alpha, 3 BHJ,
4 Vosko-Wilk-Nusair, 6 Wigner, 7 Perdew-Zunger CA, 11 ASW-BH).  GGA (PBE,
LAG) to follow.  Argument convention matches the reference call from
VXC0SP: rho1 = minority(down) density, rho2 = majority(up) density, rho =
total; returns (v_down, v_up, exc).  All quantities Rydberg units.
"""

from __future__ import annotations

import numpy as np

TOLD = 1.0e-20
OTH = 1.0 / 3.0
FTH = 4.0 / 3.0


class XCFunctional:
    def __init__(self, txc: int = 1, nsp: int = 2):
        self.txc = txc
        if txc in (1, 3, 11):
            if txc == 1:  # von Barth-Hedin J. Phys. C5, 1629 (1972)
                self.xccp, self.xccf = 0.0504, 0.0254
                self.xcrp, self.xcrf = 30.0, 75.0
            elif txc == 3:  # Barth-Hedin-Janak PRB 12, 1257 (1975)
                self.xccp, self.xccf = 0.045, 0.0225
                self.xcrp, self.xcrf = 21.0, 53.0
            else:  # ASW variant
                self.xccp, self.xccf = 0.0450, 0.0225
                self.xcrp, self.xcrf = 21.0, 52.9167
            self.aa = 0.5**OTH
            self.bb = 1.0 - self.aa
        elif txc == 2:
            self.xalpha = 6.0 * 1.0 * (3.0 / (4.0 * np.pi)) ** OTH
        elif txc == 6:
            self.aw = 0.916 * 4.0 / 3.0
            self.bw = 0.88 * 4.0 / 3.0
            self.cw = 0.88 * 7.8 / 3.0
        elif txc == 7:
            self.aca, self.bca = 1.0529, 0.3334
            self.cca = 7.0 * self.aca / 6.0
            self.dca = 4.0 * self.bca / 3.0
            self.fca = 4.0 / 3.0
            self.oca, self.pca, self.qca, self.rca = 0.096, 0.0622, 0.0232, 0.004
            self.sca = self.oca + self.pca / 3.0
            self.tca = (2.0 * self.qca + self.rca) / 3.0

    def xcpot(self, rho1, rho2, rho):
        """Vectorised over radial points.  rho1/rho2/rho are arrays (or
        scalars); returns (v1, v2, exc) with v1 paired to rho1."""
        rho1 = np.asarray(rho1, dtype=np.float64)
        rho2 = np.asarray(rho2, dtype=np.float64)
        rho = np.asarray(rho, dtype=np.float64)
        bad = (rho1 < TOLD) | (rho2 < TOLD)
        rho1s = np.where(bad, 1.0, rho1)
        rho2s = np.where(bad, 1.0, rho2)
        rhos = np.where(bad, 1.0, rho)
        rs1 = ((4.0 * np.pi) * rhos / 3.0) ** OTH
        rs = 1.0 / rs1
        txc = self.txc
        if txc == 2:
            exc = -0.75 * self.xalpha * (0.5 * rhos) ** OTH
            v1 = -self.xalpha * rho1s**OTH
            v2 = -self.xalpha * rho2s**OTH
        elif txc == 4:
            v1, v2, exc = self._vwn(rho1s, rho2s, rhos, rs)
        elif txc == 6:
            rs78 = 1.0 / (rs + 7.8)
            exc = -0.916 * rs1 - 0.88 * rs78
            v1 = self.cw * rs78 * rs78 - self.aw * rs1 - self.bw * rs78
            v2 = v1
        elif txc == 7:
            v1, v2, exc = self._pz(rs, rs1)
        else:  # von Barth-Hedin family (1, 3, 11, default)
            rsf = rs / self.xcrf
            rsp = rs / self.xcrp
            fcf = (1.0 + rsf**3) * np.log(1.0 + 1.0 / rsf) + 0.5 * rsf - rsf**2 - OTH
            fcp = (1.0 + rsp**3) * np.log(1.0 + 1.0 / rsp) + 0.5 * rsp - rsp**2 - OTH
            epscp = -self.xccp * fcp
            epscf = -self.xccf * fcf
            epsxp = -0.91633059 / rs
            cny = 5.1297628 * (epscf - epscp)
            x = rho1s / rhos
            fx = (x**FTH + (1.0 - x) ** FTH - self.aa) / self.bb
            exc = epsxp + epscp + fx * (cny + FTH * epsxp) / 5.1297628
            ars = -1.22177412 / rs + cny
            brs = -self.xccp * np.log(1.0 + self.xcrp / rs) - cny
            v1 = ars * (2.0 * x) ** OTH + brs
            v2 = ars * (2.0 * rho2s / rhos) ** OTH + brs
        z = np.zeros_like(rhos)
        return (np.where(bad, z, v1), np.where(bad, z, v2), np.where(bad, z, exc))

    def _vwn(self, rho1, rho2, rho, rs):
        ap, af = 0.0621814, 0.0310907
        bp, bf = 3.72744, 7.060428
        cp, cf = 12.9352, 18.0578
        cp1, cp2, cp3 = 1.2117833, 1.1435257, -0.031167608
        cf1, cf2, cf3 = 2.9847935, 2.7100059, -0.1446006
        qp, qf = 6.1519908, 4.7309269
        xp0, xf0 = -0.10498, -0.32500
        aa = 2.0**FTH - 2.0
        x = np.sqrt(rs)
        xpx = x * x + bp * x + cp
        xfx = x * x + bf * x + cf
        s = (rho2 - rho1) / rho
        sp = 1.0 + s
        sm = 1.0 - s
        s4 = s**4 - 1.0
        fs = (sp**FTH + sm**FTH - 2.0) / aa
        beta = 1.0 / (2.74208 + 3.182 * x + 0.09873 * x * x + 0.18268 * x**3)
        dfs = FTH * (sp**OTH - sm**OTH) / aa
        dbeta = -(0.27402 * x + 0.09873 + 1.591 / x) * beta**2
        atnp = np.arctan(qp / (2.0 * x + bp))
        atnf = np.arctan(qf / (2.0 * x + bf))
        ecp = ap * (np.log(x * x / xpx) + cp1 * atnp
                    - cp3 * (np.log((x - xp0) ** 2 / xpx) + cp2 * atnp))
        ecf = af * (np.log(x * x / xfx) + cf1 * atnf
                    - cf3 * (np.log((x - xf0) ** 2 / xfx) + cf2 * atnf))
        ec = ecp + fs * (ecf - ecp) * (1.0 + s4 * beta)
        tp1 = (x * x + bp * x) / xpx
        tf1 = (x * x + bf * x) / xfx
        ucp = ecp - ap / 3.0 * (1.0 - tp1 - cp3 * (x / (x - xp0) - tp1 - xp0 * x / xpx))
        ucf = ecf - af / 3.0 * (1.0 - tf1 - cf3 * (x / (x - xf0) - tf1 - xf0 * x / xfx))
        uc0 = ucp + (ucf - ucp) * fs
        uc20 = uc0 + (ecf - ecp) * sm * dfs
        uc10 = uc0 - (ecf - ecp) * sp * dfs
        duc = (ucf - ucp) * beta * s4 * fs + (ecf - ecp) * (-rs / 3.0) * dbeta * s4 * fs
        duc2 = duc + (ecf - ecp) * beta * sm * (4.0 * s**3 * fs + s4 * dfs)
        duc1 = duc - (ecf - ecp) * beta * sp * (4.0 * s**3 * fs + s4 * dfs)
        uc1 = uc10 + duc1
        uc2 = uc20 + duc2
        epx = -0.91633059 / rs * (1.0 + FTH * fs / 5.1297628)
        amyx2 = -1.22177412 / rs * sp**OTH
        amyx1 = -1.22177412 / rs * sm**OTH
        return uc1 + amyx1, uc2 + amyx2, ec + epx

    def _pz(self, rs, rs1):
        ex = -0.9164 * rs1
        big = rs >= 1.0
        sqrtrs = np.sqrt(np.where(big, rs, 1.0))
        denom1 = 1.0 / (1.0 + self.aca * sqrtrs + self.bca * rs)
        ec_b = -0.2846 * denom1
        v_b = self.fca * ex + ec_b * (1.0 + self.cca * sqrtrs + self.dca * rs) * denom1
        rslog = np.log(np.where(big, 1.0, rs))
        rsln = rs * rslog
        ec_s = -self.oca + self.pca * rslog - self.qca * rs + self.rca * rsln
        v_s = self.fca * ex - self.sca + self.pca * rslog - self.tca * rs + self.uca * rsln
        exc = ex + np.where(big, ec_b, ec_s)
        v = np.where(big, v_b, v_s)
        return v, v, exc
