from skelsplat_tpu.parallel.mesh import (choose_mesh, make_mesh,
                                         multichip_train_step,
                                         multichip_programs,
                                         batch_scene_records)

__all__ = ["choose_mesh", "make_mesh", "multichip_train_step",
           "multichip_programs", "batch_scene_records"]
