# Developer gates. See RELEASE.md for when each must run.

PY := python
CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: preflight preflight-tests bench dryrun test

# Fast CPU subset covering the demo post-processing hot paths (<2 min).
preflight-tests:
	$(CPU_ENV) $(PY) -m pytest tests/test_postproc.py \
	    tests/test_cluster_device.py -x -q

# Full pre-snapshot gate: fast tests, then the DRIVER-CONTRACT bench run
# (fresh process, 1200 s hard budget, headline within 900 s, zero
# compile-cache growth in the auxiliary stages), then the multichip
# sharding dryrun. Chip steps must not overlap the CPU pytest step.
preflight: preflight-tests preflight-driver dryrun
	@echo "preflight OK"

# The exact conditions the driver runs bench.py under (round-4 postmortem:
# a warm-environment `make bench` passed while the driver's fresh process
# timed out). Run TWICE after any compile-path change: the first run may
# legitimately warm the cache; the second must add zero entries.
preflight-driver:
	$(PY) benchmarks/driver_sim.py

bench:
	$(PY) bench.py

dryrun:
	$(CPU_ENV) $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# Full suite (~34 min on the 1-core bench host).
test:
	$(CPU_ENV) $(PY) -m pytest tests/ -q
