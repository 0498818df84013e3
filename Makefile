# Developer targets (capability parity with the reference Makefile's
# format/lint/test, adapted to this repo's tooling).

.PHONY: test test-fast bench bench-quick native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x

bench:
	python bench.py

bench-quick:
	python bench.py --quick

native:
	$(MAKE) -C native

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +
	$(MAKE) -C native clean 2>/dev/null || true
