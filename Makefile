# Developer entry points.
#
# NOTE (this machine): a global sitecustomize on PYTHONPATH registers a
# remote-TPU (axon) client in every python process; CPU test runs must clear
# PYTHONPATH or they serialize against the TPU tunnel.

TEST_ENV = PYTHONPATH= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast native bench clean

test: native
	$(TEST_ENV) python -m pytest tests/ -q

test-fast: native
	$(TEST_ENV) python -m pytest tests/ -q -x -m "not slow"

native:
	$(MAKE) -C native

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf tests/.jax_cache
