from rapidnet_tpu.solver.batch import BatchedSmpcController
from rapidnet_tpu.solver.controller import SmpcController

__all__ = ["SmpcController", "BatchedSmpcController"]
