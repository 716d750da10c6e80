"""Exchange (Jij/DMI) parity against tests/postproc references."""

import json
import os
import tempfile

import numpy as np
import pytest

from rslmtoasa_tpu.config import JobConfig
from rslmtoasa_tpu.models.bulk import BulkSystem
from rslmtoasa_tpu.models.exchange import ExchangeCalculation


@pytest.fixture(scope="module")
def exchange_run(reference_dir):
    cfg = JobConfig.from_file(
        str(reference_dir / "example/exchange/bccFe/input.nml")
    )
    cfg.atoms.database = str(reference_dir / "example/exchange/bccFe")
    cfg.control.nsp = 2
    cfg.control.recur = "block"
    cfg.control.lld = 20
    cfg.scf.nstep = 1
    cfg.hamiltonian.hoh = False
    wd = tempfile.mkdtemp(prefix="rslmto_xc_")
    sys_ = BulkSystem.build(cfg, wd)
    xc = ExchangeCalculation(sys_, cfg.lattice.ijpair, wd)
    xc.run()
    return wd


def test_jij_values(reference_dir, exchange_run):
    ref = json.loads(
        (reference_dir
         / "tests/postproc/references/Example_exchange_bccFe/ref.json"
         ).read_text()
    )
    lines = open(os.path.join(exchange_run, "jij.out")).readlines()
    for row, cols in ref["text"]["jij.out"].items():
        parts = lines[int(row) - 1].split()
        for col, val in cols.items():
            mine = float(parts[int(col) - 1])
            assert abs(mine - val) < 1e-4, (row, col, mine, val)


def test_dij_values(reference_dir, exchange_run):
    ref = json.loads(
        (reference_dir
         / "tests/postproc/references/Example_exchange_bccFe/ref.json"
         ).read_text()
    )
    lines = open(os.path.join(exchange_run, "dij.out")).readlines()
    for row, cols in ref["text"]["dij.out"].items():
        parts = lines[int(row) - 1].split()
        for col, val in cols.items():
            mine = float(parts[int(col) - 1])
            assert abs(mine - val) < 1e-4, (row, col, mine, val)
