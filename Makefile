# sc-depth-tpu developer targets
.PHONY: test test-all test-fullopt bench native overfit mfu clean

test:            ## default suite: everything but the slow end-to-end cases
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -m "not slow"

test-all:        ## full suite incl. slow fp64 parity + e2e CLI training
	PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

test-fullopt:    ## golden/parity subset under the production XLA pipeline
	PALLAS_AXON_POOL_IPS= SCSFM_TEST_FULL_OPT=1 python -m pytest -q \
		tests/test_geometry.py tests/test_grid_sample.py \
		tests/test_losses.py tests/test_metrics.py \
		tests/test_warp_band.py tests/test_packed_decoder.py
	# full-step coverage under the production pipeline: torch parity of
	# the canonical band64 loss+grads AND the shipped fused train step
	# (scan+augment+Adam) compiled+run deterministically (VERDICT r3 #8)
	PALLAS_AXON_POOL_IPS= SCSFM_TEST_FULL_OPT=1 python -m pytest -q \
		tests/test_fullstep_parity.py \
		-k "canonical-band64 or production_train_step_fullopt"

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
