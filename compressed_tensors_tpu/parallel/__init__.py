from compressed_tensors_tpu.parallel.mesh import (  # noqa: F401
    llama_param_specs,
    make_mesh,
    shard_llama_params,
)
from compressed_tensors_tpu.parallel.overlap import (  # noqa: F401
    matmul_reducescatter,
    ring_allgather_matmul,
)
