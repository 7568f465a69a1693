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
consts = pallas_apg.pad_constants(fa)
print("vmem MB", pallas_apg.vmem_bytes(consts)/1e6, "fits", pallas_apg.fits_vmem(consts))
run_p, padf = pallas_apg.make_apg_pallas(fa, **kw)
step_p = padf(step)
out_p = jax.block_until_ready(run_p(step_p))
print("control diff", float(np.abs(np.asarray(out_x["control"])-np.asarray(out_p["control"])).max()))
def t(f, *a):
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); jax.block_until_ready(f(*a)); ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3
print("xla ms", t(run_x, fa, step))
print("pallas ms", t(run_p, step_p))
