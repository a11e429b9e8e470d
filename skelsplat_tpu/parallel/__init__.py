from skelsplat_tpu.parallel.mesh import (make_mesh, multichip_train_step,
                                         batch_scene_records)

__all__ = ["make_mesh", "multichip_train_step", "batch_scene_records"]
