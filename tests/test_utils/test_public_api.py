"""Top-level API surface: every name a `compressed_tensors` user would
import from the reference's flat re-exports has an analogue at
`compressed_tensors_tpu` top level (ref src/compressed_tensors/__init__.py)."""

import compressed_tensors_tpu as m

REFERENCE_SURFACE = [
    # spec layer
    "QuantizationArgs", "QuantizationScheme", "QuantizationConfig",
    "QuantizationStatus", "QuantizationStrategy", "QuantizationType",
    "CompressionFormat", "SparsityStructure", "SparsityCompressionConfig",
    # compressors
    "BaseCompressor", "ModelCompressor", "DenseCompressor",
    "NaiveQuantizationCompressor", "IntQuantizationCompressor",
    "FloatQuantizationCompressor", "PackedQuantizationCompressor",
    "NVFP4PackedCompressor", "MXFP4PackedCompressor",
    "MXFP8QuantizationCompressor", "COMPRESSIBLE_MODULE_TYPES",
    "TensorStateDict",
    # quant math
    "quantize", "dequantize", "fake_quantize", "calculate_qparams",
    "calculate_range", "compute_dynamic_scales_and_zp", "generate_gparam",
    "cast_to_fp4",
    # codec helpers
    "pack_to_int32", "unpack_from_int32", "pack_fp4_to_uint8",
    "unpack_fp4_from_uint8", "pack_bitmasks", "unpack_bitmasks",
    # matching
    "match_name", "match_named_modules", "match_named_parameters",
    "match_targets", "match_modules_set", "match_quantizable_tensors",
    "is_match", "is_narrow_match", "get_lowest_common_ancestor_name",
    # misc helpers
    "Aliasable", "ParameterizedDefaultDict", "getattr_chain",
    "shard_tensor", "combine_shards",
    # safetensors I/O
    "get_weight_map", "get_nested_weight_mappings", "get_safetensors_header",
    "is_quantization_param", "update_safetensors_index",
    # offload
    "OffloadCache", "DeviceCache", "DiskCache", "disable_offloading",
    "max_binary_search",
    # constants + logging
    "QUANTIZATION_CONFIG_NAME", "SPARSITY_CONFIG_NAME",
    "TRANSFORM_CONFIG_NAME", "QUANTIZATION_METHOD_NAME",
    "COMPRESSION_VERSION_NAME", "logger",
]


def test_reference_surface_present():
    missing = [n for n in REFERENCE_SURFACE if not hasattr(m, n)]
    assert not missing, missing


def test_version_present():
    assert isinstance(m.__version__, str) and m.__version__
