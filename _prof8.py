import time, numpy as np, jax
import bench as B
from rapidnet_tpu.engine.engine import XS_UPPER
from rapidnet_tpu.ops import pallas_apg

cfg, eng, fa, make_step, tree = B.build_problem()
step = make_step(cfg.current_x)
kwb = dict(inv_step=1.0/cfg.step_size, step_size=cfg.step_size,
          penalty_state=cfg.penalty_state, penalty_safety=cfg.penalty_safety,
          xs_upper=float(XS_UPPER))
def timeit(f, *a):
    jax.block_until_ready(f(*a))
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3
for it in (1, 10, 50, 100, 200, 500):
    run = pallas_apg.make_apg_pallas(fa, max_iterations=it, **kwb)
    print(f"iters={it:4d}  {timeit(run, step):8.2f} ms")
