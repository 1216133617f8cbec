from tts_tpu.parallel.mesh import make_mesh, local_batch_slice, is_primary
from tts_tpu.parallel.data_parallel import (make_dp_train_step,
                                            make_glow_dp_train_step,
                                            replicate, unreplicate)

__all__ = ["make_mesh", "local_batch_slice", "is_primary",
           "make_dp_train_step", "make_glow_dp_train_step",
           "replicate", "unreplicate"]
