#!/usr/bin/env python3
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Capture a perfetto trace of the conv-df64 bench step and summarize."""
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rslmto_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from rslmtoasa_tpu.models.presets import build_synthetic_bcc
from rslmtoasa_tpu.ops.lanczos import split_complex
from rslmtoasa_tpu.ops.stencil_conv import (
    _lanczos_conv_df64_jit, build_conv_stencil, conv_start_vectors,
    pack_conv_kernel_df64,
)

lld = 20
sys_ = build_synthetic_bcc(rc=120.0, ndim=1000000, lld=lld)
st = build_conv_stencil(sys_.cluster)
hb = sys_.ham
hs_split = np.asarray(split_complex(np.asarray(hb.ee[0, :, :9, :9])))
w, h_scale, radius = pack_conv_kernel_df64(hs_split, st.dcells)
starts = list(range(0, hb.kk, max(1, hb.kk // 16)))[:16]
psi0_ds = conv_start_vectors(st, starts, 18, orbitals=range(9))
mask = jnp.asarray(st.mask)


def run():
    out = _lanczos_conv_df64_jit(w, mask, psi0_ds[0], psi0_ds[1],
                                 jnp.float32(h_scale), lld, 7,
                                 tuple(radius))
    return np.asarray(out[0])


run()  # compile
t0 = time.perf_counter()
run()
print(f"# steady run {time.perf_counter()-t0:.2f}s", flush=True)

jax.profiler.start_trace("/tmp/rslmto_trace", create_perfetto_trace=True)
run()
jax.profiler.stop_trace()

files = glob.glob("/tmp/rslmto_trace/**/*perfetto*", recursive=True)
print("trace files:", files, flush=True)
for f in files:
    op = open
    if f.endswith(".gz"):
        op = gzip.open
    with op(f, "rt") as fh:
        data = json.load(fh)
    evs = data["traceEvents"] if isinstance(data, dict) else data
    # find the device track(s): sum durations by event name
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in evs:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            tot[name] += e["dur"]
            cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
    total = sum(tot.values())
    print(f"== {f}: total {total/1e3:.1f} ms over {len(tot)} names")
    for name, dur in top:
        print(f"  {dur/1e3:9.1f} ms  x{cnt[name]:4d}  {name[:110]}")
