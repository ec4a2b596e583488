# sc-depth-tpu developer targets
.PHONY: test test-fast bench native overfit mfu clean

test:            ## full test suite (CPU, 8 virtual devices)
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

test-fast:       ## skip the slow end-to-end CLI training test
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -m "not slow"

bench:           ## canonical train-step throughput on the attached TPU
	python bench.py

native:          ## build the C++ JPEG decode extension in-place
	python native/build.py

overfit:         ## end-to-end learning sanity check on synthetic geometry
	python tools/overfit_check.py

mfu:             ## FLOPs/bandwidth/MFU report for the fused train step
	python tools/mfu_report.py

clean:
	rm -rf checkpoints __pycache__ .pytest_cache
