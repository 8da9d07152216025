# Top-level build orchestration — the analog of the reference's build.sh
# (which debuild'ed six modules). Builds the native components, emits the
# IDL descriptors, and runs the test suite.

NATIVE_DIRS = nubomedia_vca_tpu/cpp/golden_tool nubomedia_vca_tpu/cpp/ingest

.PHONY: all native idl clients dist test bench clean

all: native idl clients

# client-library codegen from the IDL (kurento-module-creator analog:
# Python + JS + Java client projects into clients/)
clients: idl
	python -m nubomedia_vca_tpu.api.client_gen idl clients

# installable wheel (the .deb-package analog); offline build via the
# already-installed setuptools
dist:
	python -m pip wheel . --no-deps --no-build-isolation -w dist/

native:
	for d in $(NATIVE_DIRS); do $(MAKE) -C $$d; done

idl:
	python -m nubomedia_vca_tpu.api.idl idl

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	for d in $(NATIVE_DIRS); do $(MAKE) -C $$d clean; done
	rm -rf idl
