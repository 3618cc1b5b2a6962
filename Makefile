.PHONY: test test-fast bench native clean demo

test:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/ -q

test-fast:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/ -x -q -k "not cli and not band_cli"

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 chromosight_tpu/native/kernels.cpp -o chromosight_tpu/native/_native.so

demo:
	python -m chromosight_tpu.cli.main detect --no-plotting data_test/example.cool /tmp/chromosight_demo
	head -5 /tmp/chromosight_demo.tsv

clean:
	rm -rf build dist *.egg-info chromosight_tpu/native/_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
