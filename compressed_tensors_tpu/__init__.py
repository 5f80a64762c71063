"""compressed_tensors_tpu: a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of vllm-project/compressed-tensors — the safetensors-extended
quantization/sparsity checkpoint format, its full lifecycle (config ->
calibrate -> quantize -> compress -> serialize -> decompress), and a
run-compressed inference engine with fused Pallas dequant-GEMM kernels.
"""

from compressed_tensors_tpu.version import __version__  # noqa: F401
from compressed_tensors_tpu.config import (  # noqa: F401
    COMPRESSION_VERSION_NAME,
    QUANTIZATION_CONFIG_NAME,
    QUANTIZATION_METHOD,
    QUANTIZATION_METHOD_NAME,
    SPARSITY_CONFIG_NAME,
    TRANSFORM_CONFIG_NAME,
    CompressionFormat,
    SparsityCompressionConfig,
    SparsityStructure,
)
from compressed_tensors_tpu.quantization import (  # noqa: F401
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
    QuantizationStrategy,
    QuantizationType,
)
