from custom_yolo_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding, param_shardings, replicate, shard_train_state)
