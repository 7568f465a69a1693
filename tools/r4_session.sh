#!/bin/bash
# Round-4 TPU measurement session — run in background, all logs to /tmp.
# Order: cheap/validating first, long benches last.
cd /root/repo
set -x
date
# 0. transport sanity
timeout 300 python -c "import jax, jax.numpy as jnp; print('tpu ok', float(jnp.ones(8).sum()))" || exit 1

# 1. real-TPU compile tier (task 7) — validates every kernel family at
#    small scale BEFORE any config-5 run (incl. the fused stream variant)
RAPIDNET_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_compile.py -m tpu -q -rA 2>&1 | tail -15
date

# 2. A/B r01 vs HEAD (task 1)
timeout 7200 python tools/ab_r01.py --rounds 3 2>&1 | tail -12
date

# 3. config-5 stream variants (task 4)
timeout 5400 python tools/bench_r4_stream.py --repeats 5 2>&1 | grep -v WARNING | tail -8
date

# 4. config-5 streaming QN (task 3)
timeout 7200 python tools/bench_r4_qn.py --repeats 3 2>&1 | grep -v WARNING | tail -8
date

# 5. warm-start study (task 5)
timeout 5400 python tools/warm_start_study.py 2>&1 | grep -v WARNING | tail -20
date
echo SESSION_DONE
