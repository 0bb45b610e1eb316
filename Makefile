.PHONY: test bench native dryrun parity clean

# Real-weight parity gate: reports exactly which artifacts are missing,
# and runs the gate when they exist (tests/test_real_weight_parity.py).
parity:
	@python tools/parity_check.py

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
