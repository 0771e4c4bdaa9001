from massivedatans_tpu.parallel.sharded import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    make_sharded_run_chunk,
    shard_problem,
    shard_state,
)
