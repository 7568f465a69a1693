#!/bin/bash
# Round-4 supplemental session: the two steps that failed in r4b
# (ab_r01 env bug, bench's false-positive wedge probe), plus the
# fused-row merge into LADDER.json.  Run AFTER r4b finishes.
cd /root/repo
set -x
date
timeout 600 python -c "import jax, jax.numpy as jnp; print('tpu ok', float(jnp.ones(8).sum()))" || exit 1

# 1. A/B r01 vs HEAD on the chip (fixed PYTHONPATH)
timeout 3600 python tools/ab_r01.py --rounds 3 2>&1 | tee results_r4/ab_r01.log | tail -10
date

# 2. headline bench (fixed probe timeout; incl. pipelined + anchor)
timeout 5400 python bench.py > results_r4/bench.json 2> results_r4/bench.err
tail -8 results_r4/bench.err; cat results_r4/bench.json
date
echo SESSION_C_DONE
