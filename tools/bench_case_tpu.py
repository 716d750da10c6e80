#!/usr/bin/env python3
"""VERDICT r2 gate #1 measurement: the REAL reference SCF cases' block
recursion on the TPU — ms-conv df64 engine vs the emulated-f64 gather
engine, with CPU-f64 parity.

Runs bulk/bccFe (block, hoh, lld 20) and bulk/Pt2MnGa (block, lld 20)
exactly as patched by /root/reference/tests/scf/cases.json.

Usage: python tools/bench_case_tpu.py [block|chebyshev] from the repo root.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def run_case(case, lld_cap=None):
    """case: a cases.json entry — the REAL patch (incl. the chebyshev
    energy-window widening) is applied with the suite's own helper."""
    import json

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    import test_scf_cases as T

    from rslmtoasa_tpu.config import JobConfig
    from rslmtoasa_tpu.models.bulk import BulkSystem

    case_dir = os.path.join("/root/reference/tests/scf/cases",
                            case["case"])
    mode = case["namelists"]["control"]["recur"]
    hoh = bool(case["namelists"].get("hamiltonian", {}).get("hoh"))
    wd = tempfile.mkdtemp(prefix="rslmto_gate_")
    for f in os.listdir(case_dir):
        shutil.copy(os.path.join(case_dir, f), wd)
    cfg = JobConfig.from_file(os.path.join(wd, "input.nml"))
    cfg.atoms.database = wd
    T.apply_patch(cfg, case.get("namelists", {}))
    if lld_cap:
        cfg.control.lld = min(cfg.control.lld, lld_cap)
    sys_ = BulkSystem.build(cfg, wd)
    sys_.build_hamiltonian()
    print(f"# kk={sys_.cluster.kk} ntot={sys_.cluster.cell.ntot} "
          f"lld={cfg.control.lld} hoh={hoh} mode={mode}", file=sys.stderr)

    def one(tag):
        t0 = time.time()
        if mode == "block":
            a_b, b2_b = sys_.run_block()
            out = (np.asarray(a_b), np.asarray(b2_b))
        else:
            out = (np.asarray(sys_.run_chebyshev(sys_.emesh)),)
        return time.time() - t0, out

    # warm both engines (compile), then time; an engine that cannot run
    # the case (the emulated gather engine OOMs Pt2MnGa: 31G needed on a
    # 16G chip) is reported as failed rather than killing the gate
    results = {}
    for tag, env in (("ms", None), ("emu", "1")):
        if env:
            os.environ["RSLMTO_NO_MSCONV"] = env
        else:
            os.environ.pop("RSLMTO_NO_MSCONV", None)
        try:
            one(tag)  # compile
            dt, out = one(tag)
            results[tag] = (dt, out)
        except Exception as e:
            print(f"{mode} {os.path.basename(case_dir)}: {tag} engine "
                  f"FAILED ({type(e).__name__})")
            results[tag] = (None, None)
    os.environ.pop("RSLMTO_NO_MSCONV", None)

    # CPU truth
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    hb = sys_.ham
    lld = cfg.control.lld
    with jax.default_device(cpu):
        import jax.numpy as jnp

        from rslmtoasa_tpu.ops.block_lanczos import block_lanczos
        from rslmtoasa_tpu.ops.chebyshev import chebyshev_moments

        cl = sys_.cluster
        lsham = hb.lsham if hb.lsham is not None else np.zeros(
            (hb.ee.shape[0], 18, 18), np.complex128)
        from rslmtoasa_tpu.ops.block_lanczos import block_start_vectors

        psi0 = block_start_vectors(cl.kk, [int(j) - 1 for j in cl.irec])
        if mode == "block":
            a_ref, b_ref = block_lanczos(
                jnp.asarray(hb.ee), jnp.asarray(lsham), jnp.asarray(hb.iz),
                jnp.asarray(hb.cols), jnp.asarray(psi0), lld, hoh=hoh,
                hso=jnp.asarray(hb.eeo) if hoh else None,
                enim=jnp.asarray(hb.enim) if hoh else None)
            truth = (np.asarray(a_ref), np.asarray(b_ref))
        else:
            em = sys_.emesh
            a_s = (em.energy_max - em.energy_min) / (2.0 - 0.3)
            b_s = (em.energy_max + em.energy_min) / 2.0
            truth = (np.asarray(chebyshev_moments(
                jnp.asarray(hb.ee), jnp.asarray(lsham), jnp.asarray(hb.iz),
                jnp.asarray(hb.cols), jnp.asarray(psi0), lld, a_s, b_s,
                hoh=hoh, hso=jnp.asarray(hb.eeo) if hoh else None,
                enim=jnp.asarray(hb.enim) if hoh else None)),)

    errs = {tag: (max(np.abs(o - t).max() for o, t in zip(out, truth))
                  if out is not None else float("nan"))
            for tag, (dt, out) in results.items()}
    t_ms, t_emu = results["ms"][0], results["emu"][0]
    name = os.path.basename(case_dir)
    fmt = lambda t, e: (f"{t:.2f}s (err {e:.2e})" if t is not None
                        else "FAILED")
    ratio = (f"{t_emu / t_ms:.1f}x" if t_ms and t_emu else "n/a")
    print(f"{mode} {name}: emu {fmt(t_emu, errs['emu'])}  "
          f"ms {fmt(t_ms, errs['ms'])}  speedup {ratio}")
    shutil.rmtree(wd, ignore_errors=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import json

    mode = sys.argv[1] if len(sys.argv) > 1 else "block"
    cases = json.load(open(
        "/root/reference/tests/scf/cases.json"))["cases"]
    names = {
        "block": ("Example_bulk_bccFe_nsp2_block_hoh",
                  "Example_bulk_Pt2MnGa_block"),
        "chebyshev": ("Example_bulk_bccFe_nsp2_chebyshev_hoh",
                      "Example_bulk_Pt2MnGa_chebyshev"),
    }[mode]
    for name in names:
        case = next(c for c in cases if c["name"] == name)
        run_case(case, lld_cap=50 if mode == "chebyshev" else None)


if __name__ == "__main__":
    main()
