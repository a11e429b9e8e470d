from skelsplat_tpu.engine.optim import AdamGroups, OptConfig
from skelsplat_tpu.engine.trainer import SceneTrainer, TrainSettings

__all__ = ["AdamGroups", "OptConfig", "SceneTrainer", "TrainSettings"]
