import os, json, shutil
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, "tests")
import numpy as np
from rslmtoasa_tpu.config import JobConfig
from test_scf_cases import apply_patch
CASES_JSON = "/root/reference/tests/postproc/cases.json"
cases = json.load(open(CASES_JSON))["cases"]
case = [c for c in cases if c["name"]=="Example_exchange_conductivity_fccPt"][0]
case_dir = os.path.join(os.path.dirname(CASES_JSON), "cases", case["case"])
wd = "/tmp/fccpt_dbg3"
shutil.rmtree(wd, ignore_errors=True); os.makedirs(wd)
for f in os.listdir(case_dir):
    shutil.copy(os.path.join(case_dir, f), wd)
cfg = JobConfig.from_file(os.path.join(wd, "input.nml"))
cfg.atoms.database = wd
apply_patch(cfg, case.get("namelists", {}))
cfg.energy.fermi = -0.085837; cfg.energy.energy_min=-2.5; cfg.energy.energy_max=1.2
print("nsp", cfg.control.nsp, "cond_type", cfg.control.cond_type,
      "linear_out", cfg.control.linear_out, "linear_in", cfg.control.linear_in,
      "cond_ll", cfg.control.cond_ll)
from rslmtoasa_tpu.models.bulk import BulkSystem
sys_ = BulkSystem.build(cfg, wd)
hb = sys_.build_hamiltonian()
print("lsham None?", hb.lsham is None)
if hb.lsham is not None:
    print("lsham absmax", np.abs(hb.lsham).max())
pot = sys_.atoms[0].potential
print("xi_p", pot.xi_p, "xi_d", pot.xi_d)
from rslmtoasa_tpu.models.conductivity import build_kubo_operator
va = build_kubo_operator(sys_, "spin", "z", np.array([0.,1.,0.]))
vb = build_kubo_operator(sys_, cfg.control.linear_in, "z", np.array([1.,0.,0.]))
print("va absmax", np.abs(va).max(), "vb absmax", np.abs(vb).max())
print("ee absmax", np.abs(hb.ee).max())
