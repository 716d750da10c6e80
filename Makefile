# Single entry point for the build/test/bench matrix
# (reference analogue: CMakeLists test registration + .github/workflows).
#
# The CPU test matrix pins the virtual 8-device mesh; TPU targets run on
# the real chip through the axon plugin.

PY ?= python
TEST_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: all install libradial test test-fast selftest-tpu bench dryrun clean

all: libradial install

install:
	pip install -e . --no-deps --no-build-isolation

libradial: rslmtoasa_tpu/native/libradial.so

rslmtoasa_tpu/native/libradial.so: rslmtoasa_tpu/native/radial.cpp
	g++ -O2 -shared -fPIC $< -o $@

# full CPU parity suite (~20 min): the reference scf/regression/postproc
# case matrices at 1e-6 + unit tiers
test: libradial
	$(TEST_ENV) $(PY) -m pytest tests/ -q

# one case per reference family (fast iteration)
test-fast: libradial
	$(TEST_ENV) RSLMTO_FAST_MATRIX=1 $(PY) -m pytest tests/ -q

# device-path numerical gates on the real TPU
selftest-tpu:
	$(PY) tools/tpu_selftest.py

# the judged benchmark (real TPU)
bench:
	$(PY) bench.py

# multi-chip sharding compile+run check on the virtual CPU mesh
dryrun:
	$(TEST_ENV) $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	rm -f rslmtoasa_tpu/native/libradial.so
