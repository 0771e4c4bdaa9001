from massivedatans_tpu.parallel.sharded import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    mesh_model_axis,
    make_sharded_run_chunk,
    shard_problem,
    shard_state,
)
