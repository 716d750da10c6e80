#!/usr/bin/env python3
"""End-to-end reference cases on the TPU: full SCF (block+HoH bcc Fe,
Pt2MnGa) and Kubo conductivity (fccPt ±HoH) through the production CLI
pipeline, gated against the stored reference values with the same
helpers the CPU suite uses (tests/test_scf_cases.py).

Every gate — SCF and conductivity — holds at the reference tolerance
1e-6 (abs 1e-6 + rel 1e-6 of the checked value, the same rule as
tests/run_test.py).  Round 3's conductivity gate was relaxed to 1e-3
for the realified-f32 device engine; the df64 ms-conv Kubo engine
(ops/kubo_ms.py) restored the reference tolerance.

Usage: python tools/tpu_case_e2e.py [scf|cond|all]   (repo root, TPU)
"""

import json
import math
import os
import shutil
import sys
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    what = sys.argv[1] if len(sys.argv) > 1 else "all"

    import test_scf_cases as T

    ok = True
    if what in ("scf", "all"):
        cases = json.load(open(
            "/root/reference/tests/scf/cases.json"))["cases"]
        for name in ("Example_bulk_bccFe_nsp2_block_hoh",
                     "Example_bulk_Pt2MnGa_block",
                     "Example_surface_fccCu001_block_hoh",
                     "Example_impurity_B2FeCo_block_hoh"):
            case = next(c for c in cases if c["name"] == name)
            ref = json.load(open(os.path.join(
                "/root/reference/tests/scf/references", name, "ref.json")))
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
                    T.check_text(wd, dict(spec,
                                          _ref=ref["text"][spec["file"]]),
                                 case.get("abs_tol", 1e-6),
                                 case.get("rel_tol", 1e-6))
            except AssertionError as e:
                good = False
                print(f"  {e}")
            ok &= good
            pack0 = getattr(main, "_pack_seen", 0.0)
            pack = _timer_total("ms-pack")
            main._pack_seen = pack
            print(f"SCF {name}: {dt:.1f}s wall  "
                  f"(ms-pack {pack - pack0:.1f}s = "
                  f"{100 * (pack - pack0) / max(dt, 1e-9):.1f}%)  "
                  f"{'PASS' if good else 'FAIL'}")
            shutil.rmtree(wd, ignore_errors=True)

    if what in ("cond", "all"):
        import tempfile

        from rslmtoasa_tpu.cli import run_calculation
        from rslmtoasa_tpu.config import JobConfig

        # the FULL reference postproc matrix: exchange (jij/dij on bcc
        # Fe, per-case tol 1e-4) and both fccPt Kubo conductivities
        # (reference default tol 1e-6) — same per-case tolerances as
        # the reference's own runner (tests/run_test.py)
        cases = json.load(open(
            "/root/reference/tests/postproc/cases.json"))["cases"]
        for case in cases:
            name = case["name"]
            ref_path = os.path.join(
                "/root/reference/tests/postproc/references", name,
                "ref.json")
            if not os.path.exists(ref_path):
                continue
            ref = json.load(open(ref_path))
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
                    T.check_text(wd, dict(spec, _ref=refs), abs_tol,
                                 rel_tol)
                except AssertionError as e:
                    good = False
                    print(f"  {e}")
            ok &= good
            print(f"POST {name}: {dt:.1f}s wall  "
                  f"(tol {abs_tol:g})  {'PASS' if good else 'FAIL'}")
            shutil.rmtree(wd, ignore_errors=True)

    print("E2E:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
