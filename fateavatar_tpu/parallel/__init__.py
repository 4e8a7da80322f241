from fateavatar_tpu.parallel.data_parallel import (  # noqa: F401
    make_device_mesh,
    make_dp_train_step,
    replicate,
    shard_frames,
)
