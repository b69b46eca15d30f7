from sessionsimilaritysearch_tpu.index.dense import DenseIndex, build_index  # noqa: F401
from sessionsimilaritysearch_tpu.index.binary import BinaryIndex  # noqa: F401
from sessionsimilaritysearch_tpu.index.sharded import ShardedDenseIndex  # noqa: F401
from sessionsimilaritysearch_tpu.index.sharded_binary import (  # noqa: F401
    ShardedBinaryIndex,
)
from sessionsimilaritysearch_tpu.index.twostage import (  # noqa: F401
    ShardedTwoStageIndex,
    TwoStageIndex,
    build_twostage_index,
)
