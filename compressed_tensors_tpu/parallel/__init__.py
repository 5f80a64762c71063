from compressed_tensors_tpu.parallel.mesh import (  # noqa: F401
    llama_param_specs,
    make_mesh,
    shard_llama_params,
)
