import time, numpy as np, jax
import bench as B
from rapidnet_tpu.engine.engine import XS_UPPER
from rapidnet_tpu.solver import apg as apg_mod

cfg, eng, fa, make_step, tree = B.build_problem()
kw = dict(inv_step=1.0/cfg.step_size, step_size=cfg.step_size,
          penalty_state=cfg.penalty_state, penalty_safety=cfg.penalty_safety,
          xs_upper=float(XS_UPPER), max_iterations=B.MAX_ITER)
fd = eng.factor_step()
run_x = jax.jit(apg_mod.make_apg(prefix_stages=fd.prefix_stages, **kw))
step = make_step(cfg.current_x)
jax.block_until_ready(run_x(fa, step))
jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(3):
    jax.block_until_ready(run_x(fa, step))
jax.profiler.stop_trace()
