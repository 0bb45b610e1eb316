.PHONY: test bench native dryrun clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C clipx/store/native

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

clean:
	$(MAKE) -C clipx/store/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
