#!/bin/bash
# Round-4 TPU measurement session (reordered): validating compile tier
# first, artifact-producing runs next, the fused-at-scale compile
# (tunnel-wedge suspect) dead last.  Each step tees to results_r4/.
cd /root/repo
mkdir -p results_r4
set -x
date
timeout 300 python -c "import jax, jax.numpy as jnp; print('tpu ok', float(jnp.ones(8).sum()))" || exit 1

# 1. real-TPU compile tier — every kernel family incl. the new
#    emulated-sharded streaming program (small scale)
RAPIDNET_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_compile.py -m tpu -q -rA 2>&1 | tee results_r4/tpu_compile_tier.log | tail -15
date

# 2. full ladder (incl. the new shardmap_stream_1dev row) + doc table
timeout 7200 python bench_ladder.py --out LADDER.json 2>&1 | tee results_r4/ladder.log | tail -8
python tools/gen_perf_table.py
date

# 3. config-5 stream two-kernel + precision variants (fused skipped)
timeout 3600 python tools/bench_r4_stream.py --repeats 5 --skip-fused 2>&1 | grep -v WARNING | tee results_r4/stream_variants.log | tail -8
date

# 4. config-5 streaming QN vs XLA
timeout 5400 python tools/bench_r4_qn.py --repeats 3 2>&1 | grep -v WARNING | tee results_r4/qn_config5.log | tail -8
date

# 5. A/B r01 vs HEAD on the chip
timeout 3600 python tools/ab_r01.py --rounds 3 2>&1 | tee results_r4/ab_r01.log | tail -12
date

# 6. headline bench (incl. pipelined throughput + independent anchor)
timeout 3600 python bench.py > results_r4/bench.json 2> results_r4/bench.err
tail -8 results_r4/bench.err; cat results_r4/bench.json
date
echo SESSION_MAIN_DONE

# 7. LAST: fused config-5 compile (wedge suspect)
timeout 3600 python tools/bench_r4_stream.py --repeats 5 2>&1 | grep -v WARNING | tee results_r4/stream_fused.log | tail -8
date
echo SESSION_DONE
