# Developer entry points (parity: reference Makefile).

.PHONY: test test-fast bench native clean lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_benchmark_scripts.py

bench:
	python bench.py

native:
	python -c "from dualip_tpu.io.native_loader import native_available; assert native_available(), 'native build failed'; print('native library OK')"

baseline:
	python benchmark/measure_torch_baseline.py

clean:
	rm -rf native/build benchmark_data .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
