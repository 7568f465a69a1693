from rapidnet_tpu.utils.timing import TicToc

__all__ = ["TicToc"]
