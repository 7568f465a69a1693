from rapidnet_tpu.solver.controller import SmpcController

__all__ = ["SmpcController"]
