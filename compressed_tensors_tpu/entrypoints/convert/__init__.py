from compressed_tensors_tpu.entrypoints.convert.convert_checkpoint import (  # noqa: F401,E501
    convert_checkpoint,
    exec_jobs,
)
from compressed_tensors_tpu.entrypoints.convert.converters import (  # noqa: F401
    AutoAWQConverter,
    CompressedTensorsDequantizer,
    Converter,
    FP8BlockDequantizer,
    ModelOptNvfp4Converter,
    build_inverse_weight_maps,
)
