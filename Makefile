# Developer entry points, mirroring the reference's Makefile targets
# (/root/reference/Makefile:24-27 `test`, :6-12 `quality`) adapted to this
# repo's layout and tooling.

.PHONY: test test-fast quality native clean

PYCHECKDIRS := compressed_tensors_tpu tests tools benchmarks examples

# full suite (CPU, virtual 8-device mesh comes from tests/conftest.py);
# xdist-parallel — the suite is parallel-safe (worker-scoped tmpdirs, the
# multiprocess harness picks free ports per test)
test:
	python -m pytest -ra -q tests -n auto

# quick signal: skip the slow end-to-end model/engine suites
test-fast:
	python -m pytest -ra -q tests \
		--ignore tests/test_models \
		--ignore tests/test_engine \
		--ignore tests/test_examples.py

# static quality gates: kernel-portability AST linter + compileall
quality:
	python tools/lint_kernels.py compressed_tensors_tpu
	python -m compileall -q $(PYCHECKDIRS)

# build the native host-side IO/codec library into the local cache
native:
	python -c "from compressed_tensors_tpu.utils.native import native_available; assert native_available(), 'native build failed'; print('native lib OK')"

clean:
	rm -rf .pytest_cache
	find $(PYCHECKDIRS) -name __pycache__ -type d -exec rm -rf {} +
