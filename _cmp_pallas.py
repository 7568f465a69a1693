import time, numpy as np, jax
import bench as B
from rapidnet_tpu.engine.engine import XS_UPPER
from rapidnet_tpu.solver import apg as apg_mod
from rapidnet_tpu.ops import pallas_apg

cfg, eng, fa, make_step, tree = B.build_problem()
kw = dict(inv_step=1.0/cfg.step_size, step_size=cfg.step_size,
          penalty_state=cfg.penalty_state, penalty_safety=cfg.penalty_safety,
          xs_upper=float(XS_UPPER), max_iterations=B.MAX_ITER)
fd = eng.factor_step()
run_x = jax.jit(apg_mod.make_apg(prefix_stages=fd.prefix_stages, **kw))
step = make_step(cfg.current_x)
out_x = jax.block_until_ready(run_x(fa, step))
run_p = pallas_apg.make_apg_pallas(fa, **kw)
out_p = jax.block_until_ready(run_p(step))
print("control diff", float(np.abs(np.asarray(out_x["control"])-np.asarray(out_p["control"])).max()))
def t(f, *a):
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return f"min {min(ts)*1e3:.2f} med {sorted(ts)[3]*1e3:.2f} ms"
print("xla   ", t(run_x, fa, step))
print("pallas", t(run_p, step))
# marginal: 50-iter pallas
kw50 = dict(kw); kw50["max_iterations"]=50
run_p50 = pallas_apg.make_apg_pallas(fa, **kw50)
jax.block_until_ready(run_p50(step))
print("pallas50", t(run_p50, step))
