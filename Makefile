# lele-tpu developer entry points
PY ?= python

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

kernel-bench:
	$(PY) scripts/kernel_bench.py

native:
	$(PY) -c "from lele_tpu.runtime.native import build_native; print('ok' if build_native(verbose=True) else 'FAILED')"

dryrun:
	$(PY) __graft_entry__.py

runners:
	./run_silero.sh && ./run_yolo26.sh && ./run_sensevoice.sh --layers 4

.PHONY: test bench kernel-bench native dryrun runners
