"""Surface (slab) cluster construction.

Implements ``lattice%build_surf_full`` (:1220-1473): slice the bulk cluster
into layers along the Miller normal ``surftype``; keep one empty-sphere
layer above the surface plane and ~50 layers below; the first ``nlay``
layers become new inequivalent surface types (recursion sites), deeper
layers keep their bulk types; per-type representatives are chosen near the
surface-normal axis.
"""

from __future__ import annotations

import numpy as np

from .cluster import Cluster


def build_surf_full(cl: Cluster, surftype: str, nlay: int,
                    nbulk_bulk: int) -> Cluster:
    miller = np.array([float(x) for x in surftype.split()])
    if cl.cell.a.shape == (3, 3) and len(miller) == 4:  # hcp 4-index
        dx, dy, dz, dw = miller
        dx2 = 2 * dx + dy
        dy2 = dx2 + 2 * dy
        miller = np.array([dx2, dy2, dw])
    d = miller

    h = cl.cr @ d  # layer heights
    # layer step = smallest nonzero height difference; ds2 = min |h|
    hu = np.unique(np.round(h, 9))
    diffs = np.abs(h[:, None] - h[None, :]).ravel()
    diffs = diffs[diffs > 1.0e-6]
    zstep = diffs.min()
    ds2 = np.abs(h).min()
    zmin = ds2 - zstep
    zmax = ds2 + 50.0 * zstep
    n = int((zmax - zmin) / zstep) + 1
    z = zmin + zstep * np.arange(n)

    max_type = int(cl.iz.max())
    atom_type = cl.iz.copy()
    crystal_type = cl.num.copy()

    keep_idx = []
    typesurf = []
    crystalsurf = []
    natoms_layer = np.zeros(n, dtype=np.int64)
    ichoicen = {}  # type -> 1-based index in the NEW cluster ordering
    nsurf = 0
    for i in range(n):
        disi_min = np.sqrt(z[i] ** 2) + 1.0
        unique_types = []
        for k in range(cl.kk):
            if abs(h[k] - z[i]) < 1.0e-6:
                nsurf += 1
                keep_idx.append(k)
                if i < nlay:
                    if atom_type[k] not in unique_types:
                        unique_types.append(atom_type[k])
                        natoms_layer[i] += 1
                        max_type += 1
                        t = max_type
                    else:
                        t = (max_type - len(unique_types)
                             + unique_types.index(atom_type[k]) + 1)
                    typesurf.append(t)
                    crystalsurf.append(crystal_type[k])
                    if np.linalg.norm(cl.cr[k]) < disi_min:
                        ichoicen[t] = nsurf
                else:
                    t = int(atom_type[k])
                    typesurf.append(t)
                    crystalsurf.append(crystal_type[k])
                    if i < nlay + nbulk_bulk:
                        if np.linalg.norm(cl.cr[k]) < disi_min:
                            ichoicen[t] = nsurf
    keep_idx = np.array(keep_idx, dtype=np.int64)
    typesurf = np.array(typesurf, dtype=np.int64)
    crystalsurf = np.array(crystalsurf, dtype=np.int64)
    if nsurf % 2 != 0:
        nsurf -= 1
        keep_idx = keep_idx[:nsurf]
        typesurf = typesurf[:nsurf]
        crystalsurf = crystalsurf[:nsurf]

    out = Cluster(
        cr=cl.cr[keep_idx], iz=typesurf, num=crystalsurf, kk=nsurf,
        alat=cl.alat, cell=cl.cell, wav=cl.wav,
    )
    out.ntype = max_type
    out.nbulk = nbulk_bulk
    out.nrec = max_type - nbulk_bulk
    out.nbas = 49
    out.irec = np.array(
        [ichoicen[nbulk_bulk + i + 1] for i in range(out.nrec)],
        dtype=np.int64,
    )
    # bulk representatives (types 1..nbulk) double as bravais-site reps
    out.ib = np.array([ichoicen[i + 1] for i in range(nbulk_bulk)],
                      dtype=np.int64)
    out.iu = out.ib[: cl.cell.ntot].copy()
    out.atlist = np.concatenate([out.ib, out.irec])
    out.natoms_layer = natoms_layer
    out.miller = d
    out._ct1 = cl._ct1
    return out
