# Evidence targets — each is one command the driver/judge can re-run.

.PHONY: test sweep sweep-small bench scaling submit-scaling

test:           ## full pytest suite (~7 min at local[32])
	python -m pytest tests/ -x -q

sweep:          ## strict DuckDB oracle sweep of EVERY registry query, sf0.01
	python strict_sweep.py /root/testdata/sf0.01

sweep-small:    ## same sweep at sf0.001 (fast pre-commit check)
	python strict_sweep.py /root/testdata/sf0.001

bench:          ## headline benchmark, one JSON line (BENCH_r{N} protocol)
	python bench.py

scaling:        ## in-JVM local[2] -> local[8] scaling efficiency
	python scale_bench.py

submit-scaling: ## literal spark-submit local-cluster N -> 4N protocol
	python submit_bench.py
