from rapidnet_tpu.engine.engine import Engine, FactorData

__all__ = ["Engine", "FactorData"]
