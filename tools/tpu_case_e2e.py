#!/usr/bin/env python3
"""End-to-end reference cases on the TPU, through the production CLI
pipeline, gated against the stored reference values with the same
helpers the CPU suite uses (tests/test_scf_cases.py).

Coverage (the FULL reference CI surface, VERDICT r4 item 1):

* ``scf``  — all 18 cases of ``/root/reference/tests/scf/cases.json``
  (bcc Fe nsp2/3/4 x block/chebyshev x ±HoH, Pt2MnGa, fccCu001
  surface, B2FeCo impurity), each checked at the reference tolerance
  (abs+rel 1e-6 unless the case overrides) AND against the reference
  CI wall budget (240 s block / 600 s chebyshev).
* ``reg``  — the ``bccFe_lanczos`` regression (the scalar-Lanczos path
  the scf matrix does not cover), vs ``Fe.nml.ref`` at the regression
  tolerances (tests/test_scf_regression.py).
* ``cond`` — the full postproc matrix (exchange jij/dij bccFe at the
  reference per-case 1e-4; both fccPt Kubo conductivities at 1e-6).
* ``sd``   — a 2-step spin-dynamics run (SCF per step + Depondt, the
  reference ``sd_run`` spin_dynamics.f90:410-457) on the bcc Fe case;
  the device trajectory is compared against a CPU f64 run of the same
  seed/inputs (``sd-cpu`` submode runs in a subprocess).

Usage: python tools/tpu_case_e2e.py [scf|reg|cond|sd|all]  (repo root)
"""

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def _timer_total(name):
    """Sum of every timer-tree node named ``name`` (packing-cost audit:
    VERDICT r3 weak #3 asks for the host packing share per case)."""
    from rslmtoasa_tpu.utils.timer import g_timer

    def walk(node):
        tot = node.total if node.name == name else 0.0
        return tot + sum(walk(c) for c in node.children.values())

    return walk(g_timer.root)


def _timer_reset_mark(state, name):
    cur = _timer_total(name)
    prev = state.get(name, 0.0)
    state[name] = cur
    return cur - prev


def run_scf(T, state):
    """All 18 reference SCF cases at reference tolerance + CI budget."""
    ok = True
    cases = json.load(open("/root/reference/tests/scf/cases.json"))["cases"]
    for case in cases:
        name = case["name"]
        ref_path = os.path.join("/root/reference/tests/scf/references",
                                name, "ref.json")
        if not os.path.exists(ref_path):
            print(f"SCF {name}: no ref.json, skipped")
            continue
        ref = json.load(open(ref_path))
        budget = float(case.get("timeout", 240))
        t0 = time.time()
        wd = T.run_case(case)
        dt = time.time() - t0
        good = True
        try:
            for spec in case.get("checks", {}).get("nml", []):
                T.check_nml(wd, dict(spec, _ref=ref["nml"][spec["file"]]),
                            case.get("abs_tol", 1e-6),
                            case.get("rel_tol", 1e-6))
            for spec in case.get("checks", {}).get("text", []):
                T.check_text(wd, dict(spec, _ref=ref["text"][spec["file"]]),
                             case.get("abs_tol", 1e-6),
                             case.get("rel_tol", 1e-6))
        except AssertionError as e:
            good = False
            print(f"  {e}")
        in_budget = dt <= budget
        ok &= good and in_budget
        pack = _timer_reset_mark(state, "ms-pack")
        geo = _timer_reset_mark(state, "geometry")
        print(f"SCF {name}: {dt:.1f}s wall (budget {budget:.0f}s "
              f"{'ok' if in_budget else 'OVER'}; geometry {geo:.1f}s, "
              f"ms-pack {pack:.1f}s)  {'PASS' if good else 'FAIL'}")
        shutil.rmtree(wd, ignore_errors=True)
    return ok


def run_reg():
    """bccFe_lanczos regression (scalar-Lanczos path) vs Fe.nml.ref."""
    from rslmtoasa_tpu.config import JobConfig
    from rslmtoasa_tpu.models.bulk import BulkSystem
    from rslmtoasa_tpu.models.scf import SelfConsistency
    from rslmtoasa_tpu.utils.namelist import read_namelists

    case = "/root/reference/tests/regression/bccFe_lanczos"
    cfg = JobConfig.from_file(os.path.join(case, "input.nml"))
    cfg.atoms.database = case
    wd = tempfile.mkdtemp(prefix="rslmto_reg_")
    t0 = time.time()
    sys_ = BulkSystem.build(cfg, wd)
    SelfConsistency(sys_, wd).run()
    dt = time.time() - t0
    mine = read_namelists(os.path.join(wd, "Fe_out.nml"))
    ref = read_namelists(os.path.join(case, "Fe.nml.ref"))
    good = True
    for key, tol in (("etot", 1e-6), ("ws_r", 1e-6), ("vmad", 1e-6),
                     ("sumec", 1e-4), ("sumev", 5e-5), ("utot", 1e-4)):
        a = mine["par"].get_scalar(key)
        b = ref["par"].get_scalar(key)
        if abs(a - b) > tol:
            good = False
            print(f"  {key}: {a} vs ref {b} (tol {tol})")
    for key, shape, tol in (("mom", (3,), 1e-9), ("pl", (3, 2), 1e-6),
                            ("ql", (3, 3, 2), 1e-6)):
        am = np.zeros(shape)
        ar = np.zeros(shape)
        mine["par"].fill_array(key, am)
        ref["par"].fill_array(key, ar)
        d = np.abs(am - ar).max()
        if d > tol:
            good = False
            print(f"  {key}: maxdiff {d:.3e} (tol {tol})")
    shutil.rmtree(wd, ignore_errors=True)
    print(f"REG bccFe_lanczos: {dt:.1f}s wall (budget 240s "
          f"{'ok' if dt <= 240 else 'OVER'})  "
          f"{'PASS' if good else 'FAIL'}")
    return good and dt <= 240


def _sd_trajectory(out_json):
    """Run a short SD workflow (2 Depondt steps on the bcc Fe scf
    case, SCF field per step) and dump the trajectory to out_json."""
    from rslmtoasa_tpu.config import JobConfig
    from rslmtoasa_tpu.models.bulk import BulkSystem
    from rslmtoasa_tpu.models.spin_dynamics import SpinDynamics

    case_dir = "/root/reference/tests/scf/cases/bulk/bccFe"
    wd = tempfile.mkdtemp(prefix="rslmto_sd_")
    for f in os.listdir(case_dir):
        shutil.copy(os.path.join(case_dir, f), wd)
    cfg = JobConfig.from_file(os.path.join(wd, "input.nml"))
    cfg.atoms.database = wd
    cfg.control.nsp = 2
    cfg.control.recur = "block"
    cfg.control.lld = 20
    cfg.scf.nstep = 1
    from rslmtoasa_tpu.utils.namelist import Assignment

    g = cfg.namelists.group("sd")
    for k, v in (("asd_step", 2), ("dt", 1.0e-15), ("alpha", 0.05),
                 ("sd_temp", 0.0), ("integrator", "depondt"),
                 ("sd_seed", 1234)):
        g.assignments.append(Assignment(name=k, index=None, values=[v]))
    sys_ = BulkSystem.build(cfg, wd)
    at = sys_.atoms[0]
    m = float(np.linalg.norm(at.potential.mom0))
    tilt = np.array([np.sin(0.3), 0.0, np.cos(0.3)])
    at.potential.mom0 = tilt * m
    at.potential.mom = tilt
    sd = SpinDynamics(sys_, wd)
    t0 = time.time()
    mom = sd.run()
    dt = time.time() - t0
    traj = open(os.path.join(wd, "output.lammpstrj")).read()
    shutil.rmtree(wd, ignore_errors=True)
    json.dump({"mom": np.asarray(mom).tolist(), "wall": dt,
               "traj": traj}, open(out_json, "w"))
    return dt


def run_sd():
    """Device SD gate: TPU trajectory vs a CPU f64 run (subprocess)."""
    dev_json = tempfile.mktemp(suffix=".json")
    cpu_json = tempfile.mktemp(suffix=".json")
    dt = _sd_trajectory(dev_json)
    r = subprocess.run([sys.executable, __file__, "sd-cpu", cpu_json],
                       cwd=os.getcwd(), capture_output=True, text=True,
                       timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
        print("SD bccFe: CPU comparison run failed  FAIL")
        return False
    dev = json.load(open(dev_json))
    cpu = json.load(open(cpu_json))
    mom_d = np.asarray(dev["mom"])
    mom_c = np.asarray(cpu["mom"])
    d = np.abs(mom_d - mom_c).max()
    good = d < 5e-5 and dev["traj"].strip() != ""
    print(f"SD bccFe (2 Depondt steps, SCF field/step): {dt:.1f}s wall; "
          f"device-vs-CPU trajectory maxdiff {d:.2e} (tol 5e-5)  "
          f"{'PASS' if good else 'FAIL'}")
    for p in (dev_json, cpu_json):
        try:
            os.remove(p)
        except OSError:
            pass
    return good


def run_cond(T):
    """The FULL reference postproc matrix: exchange (jij/dij on bcc
    Fe, per-case tol 1e-4) and both fccPt Kubo conductivities
    (reference default tol 1e-6) — same per-case tolerances as the
    reference's own runner (tests/run_test.py)."""
    from rslmtoasa_tpu.cli import run_calculation
    from rslmtoasa_tpu.config import JobConfig

    ok = True
    cases = json.load(open(
        "/root/reference/tests/postproc/cases.json"))["cases"]
    for case in cases:
        name = case["name"]
        ref_path = os.path.join(
            "/root/reference/tests/postproc/references", name, "ref.json")
        if not os.path.exists(ref_path):
            continue
        ref = json.load(open(ref_path))
        budget = float(case.get("timeout", 240))
        case_dir = os.path.join(
            "/root/reference/tests/postproc/cases", case["case"])
        wd = tempfile.mkdtemp(prefix="rslmto_e2e_")
        for f in os.listdir(case_dir):
            shutil.copy(os.path.join(case_dir, f), wd)
        cfg = JobConfig.from_file(os.path.join(wd, "input.nml"))
        cfg.atoms.database = wd
        T.apply_patch(cfg, case.get("namelists", {}))
        if case["case"].startswith("conductivity"):
            # generation-time energy window
            # (tests/test_postproc_cases.py docstring)
            cfg.energy.fermi = -0.085837
            cfg.energy.energy_min = -2.5
            cfg.energy.energy_max = 1.2
        t0 = time.time()
        rc = run_calculation(cfg, wd)
        dt = time.time() - t0
        good = rc == 0
        abs_tol = case.get("abs_tol", 1e-6)
        rel_tol = case.get("rel_tol", 1e-6)
        for spec in case.get("checks", {}).get("text", []):
            refs = {
                row: {c: v for c, v in cols.items()
                      if not (isinstance(v, float) and math.isnan(v))}
                for row, cols in ref["text"][spec["file"]].items()
            }
            try:
                T.check_text(wd, dict(spec, _ref=refs), abs_tol, rel_tol)
            except AssertionError as e:
                good = False
                print(f"  {e}")
        in_budget = dt <= budget
        ok &= good and in_budget
        print(f"POST {name}: {dt:.1f}s wall (budget {budget:.0f}s "
              f"{'ok' if in_budget else 'OVER'}; tol {abs_tol:g})  "
              f"{'PASS' if good else 'FAIL'}")
        shutil.rmtree(wd, ignore_errors=True)
    return ok


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what == "sd-cpu":
        # CPU comparison subprocess: force the host platform BEFORE
        # any jax use (the axon plugin ignores the env var)
        import jax

        jax.config.update("jax_platforms", "cpu")
        _sd_trajectory(sys.argv[2])
        return 0

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import test_scf_cases as T

    state = {}
    ok = True
    if what in ("scf", "all"):
        ok &= run_scf(T, state)
    if what in ("reg", "all"):
        ok &= run_reg()
    if what in ("cond", "all"):
        ok &= run_cond(T)
    if what in ("sd", "all"):
        ok &= run_sd()
    print("E2E:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
