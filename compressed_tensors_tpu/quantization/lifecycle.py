"""Quantization lifecycle: apply config -> initialize qparams -> calibrate ->
QDQ forward -> compress.

Functional analogue of `quantization/lifecycle/{apply,initialize,forward,
compressed}.py`. The reference mutates torch modules (registers Parameters,
monkey-patches forwards); here a model is a module graph + per-module state
dicts, and the lifecycle transforms those state dicts. The same shape rules,
status transitions and forward semantics apply.
"""

from __future__ import annotations

import dataclasses
import math
from collections import OrderedDict
from typing import Mapping, Optional

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.ops.qparams import (
    KV_CACHE_TARGETS,
    calculate_qparams,
    compute_dynamic_scales_and_zp,
    strategy_cdiv,
)
from compressed_tensors_tpu.ops.quantize import fake_quantize
from compressed_tensors_tpu.quantization.quant_args import (
    ActivationOrdering,
    DynamicType,
    QuantizationArgs,
    QuantizationStrategy,
)
from compressed_tensors_tpu.quantization.quant_config import (
    QuantizationConfig,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.quant_scheme import QuantizationScheme
from compressed_tensors_tpu.utils.match import (
    ModuleInfo,
    is_match,
    match_named_modules,
    match_targets,
)

__all__ = [
    "ModuleQuantState",
    "apply_quantization_config",
    "load_pretrained_quantization_parameters",
    "initialize_qparam_shapes",
    "initialize_module_for_quantization",
    "calibrate_module",
    "quantized_module_forward",
    "quantized_embedding_forward",
    "compress_quantized_weights",
    "expected_qparam_shapes",
    "enable_quantization",
    "disable_quantization",
    "quantization_enabled",
]

# Global QDQ gate (ref lifecycle/helpers.py:17-22 enable/disable_quantization).
# NOTE: the gate is read at TRACE time — toggling it affects subsequent
# traces only, not already-jitted callers of quantized_module_forward (whose
# compiled caches baked the value in). This diverges from the reference's
# eager semantics by necessity: to toggle QDQ under jit, re-trace (e.g. pass
# a different ModuleQuantState with enabled=False, which is static metadata
# and keys the jit cache).
_QUANTIZATION_ENABLED = True


def enable_quantization() -> None:
    """Enable the global QDQ gate for forwards traced after this call
    (no effect on already-compiled jit caches — see module note)."""
    global _QUANTIZATION_ENABLED
    _QUANTIZATION_ENABLED = True


def disable_quantization() -> None:
    """Disable the global QDQ gate for forwards traced after this call
    (no effect on already-compiled jit caches — see module note)."""
    global _QUANTIZATION_ENABLED
    _QUANTIZATION_ENABLED = False


def quantization_enabled() -> bool:
    return _QUANTIZATION_ENABLED


@dataclasses.dataclass
class ModuleQuantState:
    """Quantization state attached to one module (the functional stand-in
    for the attributes the reference registers on torch modules)."""

    scheme: QuantizationScheme
    status: QuantizationStatus = QuantizationStatus.INITIALIZED
    qparams: dict = dataclasses.field(default_factory=dict)
    enabled: bool = True


def expected_qparam_shapes(
    args: QuantizationArgs,
    observed_shape: tuple[int, ...],
) -> Optional[tuple[int, ...]]:
    """Scale/zero-point shape for a given strategy and observed shape
    (ref initialize.py:198-250). Returns None when fully dynamic."""
    strategy = args.strategy
    if args.dynamic is True:
        return None
    if args.dynamic == DynamicType.LOCAL.value or \
            args.dynamic == DynamicType.LOCAL:
        return None  # only global scale is static

    if strategy == QuantizationStrategy.TENSOR.value:
        return (1,)
    if strategy == QuantizationStrategy.TOKEN.value:
        raise ValueError("Cannot perform static token quantization")
    if strategy == QuantizationStrategy.CHANNEL.value:
        if len(observed_shape) < 2:
            raise ValueError("Channel quant requires at least 2 observed "
                             "dimensions")
        return (observed_shape[-2], 1)
    if strategy in (QuantizationStrategy.GROUP.value,
                    QuantizationStrategy.TENSOR_GROUP.value):
        assert args.group_size is not None
        if len(observed_shape) < 1:
            raise ValueError("Group quant requires at least 1 observed "
                             "dimension")
        num_groups = strategy_cdiv(observed_shape[-1], args.group_size,
                                   strategy)
        return (*observed_shape[:-1], num_groups)
    if strategy == QuantizationStrategy.BLOCK.value:
        assert args.block_structure is not None
        if len(observed_shape) < 2:
            raise ValueError("Block quant requires at least 2 observed "
                             "dimensions")
        bh, bw = args.block_structure
        num_rows = math.ceil(observed_shape[-2] / bh)
        num_cols = strategy_cdiv(observed_shape[-1], bw, strategy)
        return (num_rows, num_cols)
    if strategy == QuantizationStrategy.ATTN_HEAD.value:
        if len(observed_shape) < 3:
            raise ValueError("Attention quant requires at least 3 observed "
                             "dimensions")
        return (observed_shape[-3], 1, 1)
    raise AssertionError(f"Unknown strategy {strategy}")


def initialize_qparam_shapes(
    base_name: str,
    args: QuantizationArgs,
    observed_shape: tuple[int, ...],
    observed_dtype=jnp.bfloat16,
    force_zero_point: bool = True,
) -> dict[str, jnp.ndarray]:
    """Initialize empty qparams for one (base_name, args) pair
    (ref initialize.py:153-276). Returns {param_name: array}."""
    out: dict[str, jnp.ndarray] = {}

    # global scale for tensor-group quantization
    if args.strategy == QuantizationStrategy.TENSOR_GROUP.value:
        out[f"{base_name}_global_scale"] = jnp.zeros((1,), dtype=jnp.float32)

    shape = expected_qparam_shapes(args, observed_shape)
    if shape is None:
        return out

    scale_dtype = observed_dtype
    if np.dtype(scale_dtype) not in (
        np.dtype(np.float16), np.dtype(np.float32), np.dtype(np.float64),
    ) and str(np.dtype(scale_dtype)) != "bfloat16":
        scale_dtype = jnp.float16

    out[f"{base_name}_scale"] = jnp.zeros(shape, dtype=scale_dtype)
    if force_zero_point or not args.symmetric:
        out[f"{base_name}_zero_point"] = jnp.zeros(
            shape, dtype=jnp.dtype(np.dtype(args.zp_dtype))
        )
    if args.actorder is not None and args.actorder == ActivationOrdering.GROUP:
        out[f"{base_name}_g_idx"] = jnp.full(
            (observed_shape[-1],), -1, dtype=jnp.int32
        )
    return out


def initialize_module_for_quantization(
    scheme: QuantizationScheme,
    weight_shape: tuple[int, ...],
    weight_dtype=jnp.bfloat16,
    force_zero_point: bool = True,
    status: QuantizationStatus = QuantizationStatus.INITIALIZED,
) -> ModuleQuantState:
    """Create the quantization state for one module
    (ref initialize.py:46-120)."""
    state = ModuleQuantState(scheme=scheme, status=status)
    if scheme.weights is not None:
        state.qparams.update(
            initialize_qparam_shapes("weight", scheme.weights, weight_shape,
                                     weight_dtype, force_zero_point)
        )
    if scheme.input_activations is not None:
        state.qparams.update(
            initialize_qparam_shapes(
                "input", scheme.input_activations, (weight_shape[-1],),
                weight_dtype, force_zero_point,
            )
        )
    if scheme.output_activations is not None:
        state.qparams.update(
            initialize_qparam_shapes(
                "output", scheme.output_activations, (weight_shape[-2],),
                weight_dtype, force_zero_point,
            )
        )
    return state


def apply_quantization_config(
    modules: Mapping[str, ModuleInfo],
    weight_shapes: Mapping[str, tuple[int, ...]],
    config: QuantizationConfig | None,
    kv_module_names: list[str] | None = None,
    num_kv_heads: int | None = None,
) -> dict[str, ModuleQuantState]:
    """Resolve schemes and initialize quantization state for every matched
    module (ref apply.py:100-170).

    :param modules: module graph (name -> ModuleInfo)
    :param weight_shapes: name -> weight shape for weight-bearing modules
    :param config: quantization config (None -> no-op)
    :param kv_module_names: attention-module names for kv_cache_scheme
    :return: name -> ModuleQuantState
    """
    if config is None:
        return {}
    config = config.model_copy(deep=True)

    force_zero_point = (
        config.quantization_status < QuantizationStatus.COMPRESSED
    )

    states: dict[str, ModuleQuantState] = {}

    # kv cache scheme applies to attention modules first (ref apply.py:124)
    if config.kv_cache_scheme is not None:
        kv_scheme = QuantizationScheme(
            targets=list(KV_CACHE_TARGETS),
            input_activations=config.kv_cache_scheme,
        )
        names = kv_module_names
        if names is None:
            names = [
                name for name, info in modules.items()
                if is_match(name, info, KV_CACHE_TARGETS)
            ]
        # attn_head-strategy kv schemes serialize head-shaped
        # (num_kv_heads, 1, 1) scales (ref initialize.py:279-334, observed
        # shape (heads, None, head_dim)); everything else is per-tensor (1,)
        per_head = config.kv_cache_scheme.strategy == "attn_head"
        if per_head and num_kv_heads is None:
            raise ValueError(
                "attn_head kv_cache_scheme requires num_kv_heads "
                "(ref get_num_kv_heads, initialize.py:300)"
            )
        scale_shape = (num_kv_heads, 1, 1) if per_head else (1,)
        for name in names:
            state = ModuleQuantState(scheme=kv_scheme,
                                     status=config.quantization_status)
            # k_scale / v_scale scales (ref quant_metadata.py)
            state.qparams["k_scale"] = jnp.zeros(scale_shape,
                                                 dtype=jnp.float32)
            state.qparams["v_scale"] = jnp.zeros(scale_shape,
                                                 dtype=jnp.float32)
            states[name] = state

    target_to_scheme: "OrderedDict[str, QuantizationScheme]" = OrderedDict()
    for scheme in config.config_groups.values():
        for target in scheme.targets:
            target_to_scheme[target] = scheme

    for name, info in match_named_modules(
        modules, list(target_to_scheme), config.ignore, warn_on_fail=True
    ):
        if name not in weight_shapes:
            continue
        matched = match_targets(name, info, list(target_to_scheme))
        scheme = target_to_scheme[matched[0]]
        states[name] = initialize_module_for_quantization(
            scheme,
            weight_shapes[name],
            force_zero_point=force_zero_point,
            status=config.quantization_status,
        )
    return states


def _load_quant_args_from_mapping(
    state: ModuleQuantState,
    base_name: str,
    module_name: str,
    mapping: Mapping[str, str],
) -> None:
    """Load {base}_scale / _zero_point / _g_idx for one module from shard
    paths (ref apply.py:195-236). Symmetric checkpoints carry no zero
    point; fill zeros like the reference."""
    from compressed_tensors_tpu.utils.safetensors_io import SafetensorsFile

    def fetch(param: str):
        path = mapping.get(f"{module_name}.{param}")
        if path is None:
            return None
        f = SafetensorsFile(path)
        try:
            return jnp.asarray(np.ascontiguousarray(
                f.get(f"{module_name}.{param}")))
        finally:
            f.close()

    g_idx = fetch(f"{base_name}_g_idx")
    if g_idx is not None:
        state.qparams[f"{base_name}_g_idx"] = g_idx

    scale = fetch(f"{base_name}_scale")
    if scale is not None:
        state.qparams[f"{base_name}_scale"] = scale
        zp = fetch(f"{base_name}_zero_point")
        if zp is None:
            zp = jnp.zeros_like(scale)
        state.qparams[f"{base_name}_zero_point"] = zp


def load_pretrained_quantization_parameters(
    states: Mapping[str, ModuleQuantState],
    model_path: str,
    load_weight_qparams: bool = False,
) -> None:
    """Load static quantization parameters (scales / zero points / g_idx)
    from an on-disk checkpoint into already-initialized module states
    (ref apply.py:49-97).

    Always loads input/output activation qparams; weight qparams only when
    ``load_weight_qparams`` (the weight-decompression path usually owns
    those).
    """
    from compressed_tensors_tpu.utils.safetensors_io import (
        get_quantization_parameter_to_path_mapping,
    )

    mapping = get_quantization_parameter_to_path_mapping(model_path)
    for name, state in states.items():
        if state.scheme.input_activations is not None:
            _load_quant_args_from_mapping(state, "input", name, mapping)
        if state.scheme.output_activations is not None:
            _load_quant_args_from_mapping(state, "output", name, mapping)
        if load_weight_qparams and state.scheme.weights is not None:
            _load_quant_args_from_mapping(state, "weight", name, mapping)


# --------------------------------------------------------------------------- #
# calibration (minmax observation)

def _observe_minmax(value: jnp.ndarray, args: QuantizationArgs):
    """Observed min/max reduced per strategy (weight observation shapes;
    the spec the reference pins in tests/mock_observer.py)."""
    strategy = args.strategy
    if strategy == QuantizationStrategy.TENSOR.value:
        return jnp.min(value), jnp.max(value)
    if strategy == QuantizationStrategy.CHANNEL.value:
        return (
            jnp.min(value, axis=-1, keepdims=True),
            jnp.max(value, axis=-1, keepdims=True),
        )
    if strategy in (QuantizationStrategy.GROUP.value,
                    QuantizationStrategy.TENSOR_GROUP.value):
        g = args.group_size
        num_groups = math.ceil(value.shape[-1] / g)
        v = value.reshape(*value.shape[:-1], num_groups, g)
        return jnp.min(v, axis=-1), jnp.max(v, axis=-1)
    if strategy == QuantizationStrategy.BLOCK.value:
        bh, bw = args.block_structure
        r, c = value.shape[-2:]
        v = value.reshape(r // bh, bh, c // bw, bw)
        return (
            jnp.min(v, axis=(1, 3)),
            jnp.max(v, axis=(1, 3)),
        )
    raise ValueError(f"Cannot observe strategy {strategy}")


def calibrate_module(
    state: ModuleQuantState,
    weight: jnp.ndarray | None = None,
    sample_input: jnp.ndarray | None = None,
    sample_output: jnp.ndarray | None = None,
) -> ModuleQuantState:
    """Min-max calibration: fill static scales/zero-points from observed
    tensors and advance to CALIBRATION status.

    (The reference ships no observers — they live in llm-compressor and its
    tests fake them; a standalone framework needs at least min-max.)
    """
    from compressed_tensors_tpu.ops.qparams import generate_gparam

    scheme = state.scheme

    def _calibrate(base: str, args: QuantizationArgs, value):
        if value is None or args is None or args.dynamic is True:
            return
        mn, mx = _observe_minmax(value, args)
        global_scale = None
        if args.strategy == QuantizationStrategy.TENSOR_GROUP.value:
            global_scale = generate_gparam(jnp.min(value), jnp.max(value))
            state.qparams[f"{base}_global_scale"] = global_scale
        if args.dynamic == DynamicType.LOCAL.value or \
                args.dynamic == DynamicType.LOCAL:
            return  # only the global scale is static
        scale, zp = calculate_qparams(mn, mx, args, global_scale=global_scale)
        state.qparams[f"{base}_scale"] = scale
        if not args.symmetric or f"{base}_zero_point" in state.qparams:
            state.qparams[f"{base}_zero_point"] = zp

    _calibrate("weight", scheme.weights, weight)
    if sample_input is not None:
        _calibrate("input", scheme.input_activations, sample_input)
    if sample_output is not None:
        _calibrate("output", scheme.output_activations, sample_output)

    state.status = QuantizationStatus.CALIBRATION
    return state


# --------------------------------------------------------------------------- #
# QDQ forward

def _forward_quantize(state: ModuleQuantState, value, base: str,
                      args: QuantizationArgs):
    """Fake-quantize a value using dynamic or static scales
    (ref forward.py:292-329)."""
    if value.size == 0:
        return value
    g_idx = state.qparams.get("weight_g_idx")
    if g_idx is not None and bool(jnp.all(g_idx == -1)):
        g_idx = None
    global_scale = state.qparams.get(f"{base}_global_scale")

    if args.dynamic is True or args.dynamic == DynamicType.LOCAL.value or \
            args.dynamic == DynamicType.LOCAL:
        scale, zero_point = compute_dynamic_scales_and_zp(
            value, args, global_scale=global_scale
        )
    else:
        scale = state.qparams[f"{base}_scale"]
        zero_point = state.qparams.get(f"{base}_zero_point")

    return fake_quantize(value, scale, zero_point, args, g_idx=g_idx,
                         global_scale=global_scale)


def quantized_module_forward(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    state: ModuleQuantState,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Linear forward with QDQ applied per the module's scheme
    (ref set_forward_quantized, forward.py:244-289): quantize input ->
    fake-quant weight (skipped when status >= COMPRESSED) -> matmul ->
    quantize output. Disabled entirely when state.enabled is False."""
    scheme = state.scheme
    enabled = state.enabled and scheme is not None and _QUANTIZATION_ENABLED

    if enabled and scheme.input_activations is not None:
        x = _forward_quantize(state, x, "input", scheme.input_activations)

    if enabled and scheme.weights is not None and \
            state.status < QuantizationStatus.COMPRESSED:
        weight = _forward_quantize(state, weight, "weight", scheme.weights)

    out = x @ weight.T
    if bias is not None:
        out = out + bias

    if enabled and scheme.output_activations is not None:
        out = _forward_quantize(state, out, "output",
                                scheme.output_activations)
    return out


def quantized_embedding_forward(
    indices: jnp.ndarray,
    weight: jnp.ndarray,
    state: ModuleQuantState,
) -> jnp.ndarray:
    """Embedding gather with weight QDQ applied per the module's scheme
    (ref set_forward_quantized on torch.nn.Embedding,
    forward.py:244-289 / tests/test_quantization/lifecycle/test_forward.py:53-107).

    Embeddings carry only a weight scheme — input indices are integers and
    the gathered rows are the output, so input/output activation args are
    ignored (matching the reference, whose embedding forward consumes the
    weight path only). The whole table is fake-quantized before the gather
    so per-channel/per-group scales stay aligned with the embedding dim;
    XLA fuses the QDQ into the gather producer.
    """
    scheme = state.scheme
    enabled = state.enabled and scheme is not None and _QUANTIZATION_ENABLED

    if enabled and scheme.weights is not None and \
            state.status < QuantizationStatus.COMPRESSED:
        weight = _forward_quantize(state, weight, "weight", scheme.weights)

    return jnp.take(weight, indices, axis=0)


def compress_quantized_weights(
    state: ModuleQuantState, weight: jnp.ndarray
) -> tuple[ModuleQuantState, jnp.ndarray]:
    """Quantize the weight to its storage dtype in place of the float weight
    and set COMPRESSED status (ref compressed.py:20-60)."""
    from compressed_tensors_tpu.ops.quantize import quantize

    args = state.scheme.weights
    if args is None or args.dynamic:
        return state, weight

    g_idx = state.qparams.get("weight_g_idx")
    if g_idx is not None and bool(jnp.all(g_idx == -1)):
        g_idx = None
    quantized = quantize(
        weight,
        state.qparams["weight_scale"],
        state.qparams.get("weight_zero_point"),
        args,
        dtype=jnp.dtype(np.dtype(args.storage_dtype())),
        g_idx=g_idx,
        global_scale=state.qparams.get("weight_global_scale"),
    )
    state.status = QuantizationStatus.COMPRESSED
    return state, quantized
