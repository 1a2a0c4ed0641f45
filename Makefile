# Dev task runner (reference used `invoke` tasks.py; plain make here).

.PHONY: test test-fast lint native bench bench-index clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

# Static gate (reference: `inv lint` = mypy+black+ruff, tasks.py:77-96).
# This image ships no lint tools; tools/lint.py is a first-party AST
# checker and also invokes ruff when importable (config in pyproject).
lint:
	python tools/lint.py

native:
	$(MAKE) -C dalm_tpu/native

bench:
	python bench.py

bench-index:
	python bench_index.py

bench-serve:
	python bench_serve.py

clean:
	$(MAKE) -C dalm_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
