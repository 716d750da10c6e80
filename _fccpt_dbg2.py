import os, json, shutil, math
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, "tests")
from rslmtoasa_tpu.cli import run_calculation
from rslmtoasa_tpu.config import JobConfig
from test_scf_cases import apply_patch
CASES_JSON = "/root/reference/tests/postproc/cases.json"
cases = json.load(open(CASES_JSON))["cases"]
case = [c for c in cases if c["name"]=="Example_exchange_conductivity_fccPt"][0]
case_dir = os.path.join(os.path.dirname(CASES_JSON), "cases", case["case"])
wd = "/tmp/fccpt_dbg"
shutil.rmtree(wd, ignore_errors=True); os.makedirs(wd)
for f in os.listdir(case_dir):
    shutil.copy(os.path.join(case_dir, f), wd)
cfg = JobConfig.from_file(os.path.join(wd, "input.nml"))
cfg.atoms.database = wd
apply_patch(cfg, case.get("namelists", {}))
COND_ENERGY = {"fermi": -0.085837, "energy_min": -2.5, "energy_max": 1.2}
for k, v in COND_ENERGY.items():
    setattr(cfg.energy, k, v)
cfg.control.cond_ll = 50
rc = run_calculation(cfg, wd)
print("rc:", rc)
ref = json.load(open("/root/reference/tests/postproc/references/Example_exchange_conductivity_fccPt/ref.json"))
refrows = ref["text"]["Pt_cond.out"]
out = open(os.path.join(wd, "Pt_cond.out")).read().splitlines()
for row, cols in refrows.items():
    r = int(row)
    got = out[r-1].split() if r-1 < len(out) else ["MISSING"]
    print("row", r, "ref:", cols, "got:", got[:5])
