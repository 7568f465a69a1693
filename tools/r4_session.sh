#!/bin/bash
# Round-4 TPU measurement session — run in background, logs to stdout.
# Order: cheap/validating first; the fused-at-scale compile (wedge
# suspect) dead last, after every artifact is already written.
cd /root/repo
set -x
date
timeout 300 python -c "import jax, jax.numpy as jnp; print('tpu ok', float(jnp.ones(8).sum()))" || exit 1

# 1. real-TPU compile tier (task 7) — small-scale validation of every
#    kernel family including the fused stream variant
RAPIDNET_TPU_TESTS=1 timeout 3000 python -m pytest tests/test_tpu_compile.py -m tpu -q -rA 2>&1 | tail -15
date

# 2. A/B r01 vs HEAD on the chip (task 1)
timeout 7200 python tools/ab_r01.py --rounds 3 2>&1 | tail -12
date

# 3. config-5 stream two-kernel + precision variants (task 4, safe part)
timeout 5400 python tools/bench_r4_stream.py --repeats 5 --skip-fused 2>&1 | grep -v WARNING | tail -8
date

# 4. config-5 streaming QN (task 3)
timeout 7200 python tools/bench_r4_qn.py --repeats 3 2>&1 | grep -v WARNING | tail -8
date

# 5. headline bench with the independent anchor (tasks 1/6)
timeout 5400 python bench.py > /tmp/bench_r4.json 2> /tmp/bench_r4.err; tail -6 /tmp/bench_r4.err; cat /tmp/bench_r4.json
date

# 6. full ladder (task 8; fused row stays opt-in)
timeout 10800 python bench_ladder.py --out LADDER.json 2>&1 | tail -6
python tools/gen_perf_table.py
date
echo SESSION_MAIN_DONE

# 7. LAST: the fused config-5 compile (wedge suspect) — everything
#    above is already recorded if this wedges the tunnel
timeout 5400 python tools/bench_r4_stream.py --repeats 5 2>&1 | grep -v WARNING | tail -8
date
echo SESSION_DONE
