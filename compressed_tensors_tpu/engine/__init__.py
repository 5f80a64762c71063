from compressed_tensors_tpu.engine.generate import (  # noqa: F401
    greedy_generate,
    make_step_fns,
)
from compressed_tensors_tpu.engine.serving import (  # noqa: F401
    Completion,
    Request,
    ServingEngine,
)
