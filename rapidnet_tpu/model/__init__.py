from rapidnet_tpu.model.network import DwnNetwork
from rapidnet_tpu.model.scenario_tree import ScenarioTree
from rapidnet_tpu.model.forecaster import Forecaster
from rapidnet_tpu.model.config import SmpcConfig

__all__ = ["DwnNetwork", "ScenarioTree", "Forecaster", "SmpcConfig"]
