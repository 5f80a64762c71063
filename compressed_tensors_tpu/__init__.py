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

# --------------------------------------------------------------------------- #
# Full top-level surface, mirroring the reference's flat re-exports so a
# `compressed_tensors` user finds the same names here (ref
# src/compressed_tensors/__init__.py re-exports every subsystem).

from compressed_tensors_tpu.compressors import (  # noqa: F401
    COMPRESSIBLE_MODULE_TYPES,
    BaseCompressor,
    BitmaskCompressor,
    DenseCompressor,
    FloatQuantizationCompressor,
    IntQuantizationCompressor,
    ModelCompressor,
    NaiveQuantizationCompressor,
    PackedQuantizationCompressor,
    TensorStateDict,
    get_compressor,
    infer_format_from_schemes,
    infer_module_format,
    module_graph_from_names,
)
from compressed_tensors_tpu.compressors.nvfp4 import (  # noqa: F401
    MXFP4PackedCompressor,
    MXFP8QuantizationCompressor,
    NVFP4PackedCompressor,
)
from compressed_tensors_tpu.ops import (  # noqa: F401
    calculate_qparams,
    calculate_range,
    cast_to_fp4,
    compute_dynamic_scales_and_zp,
    dequantize,
    fake_quantize,
    generate_gparam,
    quantize,
)
from compressed_tensors_tpu.ops.pack import (  # noqa: F401
    pack_to_int32,
    unpack_from_int32,
)
from compressed_tensors_tpu.ops.fp4_pack import (  # noqa: F401
    pack_fp4_to_uint8,
    unpack_fp4_from_uint8,
)
from compressed_tensors_tpu.ops.bitmask import (  # noqa: F401
    pack_bitmasks,
    unpack_bitmasks,
)
from compressed_tensors_tpu.utils.match import (  # noqa: F401
    get_lowest_common_ancestor_name,
    is_match,
    is_narrow_match,
    match_modules_set,
    match_name,
    match_named_modules,
    match_named_parameters,
    match_quantizable_tensors,
    match_targets,
)
from compressed_tensors_tpu.utils import (  # noqa: F401
    Aliasable,
    ParameterizedDefaultDict,
    combine_shards,
    getattr_chain,
    shard_tensor,
)
from compressed_tensors_tpu.utils.safetensors_io import (  # noqa: F401
    get_nested_weight_mappings,
    get_quantization_config_dict,
    get_safetensors_header,
    get_weight_map,
    is_quantization_param,
    update_safetensors_index,
)
from compressed_tensors_tpu.offload import (  # noqa: F401
    DeviceCache,
    DiskCache,
    HostCache,
    OffloadCache,
    disable_offloading,
    disable_onloading,
    dispatch_plan,
    max_binary_search,
)
from compressed_tensors_tpu.logger import logger  # noqa: F401
from compressed_tensors_tpu.flags import (  # noqa: F401
    FLAGS,
    flag_overrides,
    reload_flags_from_env,
    set_flags,
)
