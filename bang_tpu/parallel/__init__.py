from bang_tpu.parallel.partition import build_sharded_index, ShardedIndex  # noqa: F401
from bang_tpu.parallel.sharded import (  # noqa: F401
    search_sharded,
    search_data_parallel,
)
