PY ?= /opt/venv/bin/python

.PHONY: test test-fast bench native clean-native lint

native:
	sh runtime/build.sh

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py

clean-native:
	rm -f runtime/libtumloader.so
