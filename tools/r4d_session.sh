#!/bin/bash
# Round-4 supplemental session, attempt 2: ONE patient probe (a dead
# claim on the terminal can take tens of minutes to expire; killing
# waiting clients only enqueues more dead claims), then ab + bench.
cd /root/repo
set -x
date
timeout 2700 python -c "import time,jax,jax.numpy as jnp; t0=time.time(); v=float(jnp.ones(8).sum()); print('tpu ok', v, round(time.time()-t0,1),'s')" || exit 1
date
timeout 2400 python tools/ab_r01.py --rounds 2 2>&1 | tee results_r4/ab_r01.log | tail -10
date
timeout 5400 python bench.py > results_r4/bench.json 2> results_r4/bench.err
tail -8 results_r4/bench.err; cat results_r4/bench.json
date
echo SESSION_D_DONE
