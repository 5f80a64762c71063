"""Validation-semantics corpus for QuantizationArgs / Scheme / Config,
ported from the reference's tests/test_quantization/
{test_quant_args,test_quant_scheme,test_quant_config}.py. These pydantic
schemas ARE the on-disk format; their validation behavior is the spec."""

import pytest
from pydantic import ValidationError

from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.quant_args import ActivationOrdering
from compressed_tensors_tpu.quantization.quant_config import (
    DEFAULT_QUANTIZATION_FORMAT,
    DEFAULT_QUANTIZATION_METHOD,
    get_vllm_module_type,
)


# --------------------------------------------------------------------------- #
# QuantizationArgs (ref test_quant_args.py)

def test_args_defaults():
    default = QuantizationArgs()
    assert default.num_bits == 8
    assert default.type == "int"
    assert default.symmetric
    assert default.strategy == "tensor"
    assert default.group_size is None
    assert default.block_structure is None


def test_args_group():
    group = QuantizationArgs(strategy="group", group_size=128)
    assert group.strategy == "group"
    assert group.group_size == 128

    with pytest.raises(ValueError):
        QuantizationArgs(strategy="group", group_size=-1)
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="group")  # needs a group size
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="tensor", group_size=128)


def test_args_block():
    block = QuantizationArgs(strategy="block", block_structure="2x4")
    assert block.strategy == "block"
    assert block.block_structure == [2, 4]
    assert block.block_structure != "2x4"  # parsed, not stored raw


def test_block_structure_string_length_validation():
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy="block", block_structure="2x4x8")
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy="block", block_structure=[2, 4, 8])


def test_block_structure_string_non_int():
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy="block", block_structure="2xfoo")


@pytest.mark.parametrize(
    "block_structure",
    ([0, 4], [-1, 4], [4, 0], [4, -1], "0x4", "-1x4", "4x0", "4x-1"),
)
def test_block_structure_requires_positive_dimensions(block_structure):
    with pytest.raises(ValidationError, match="positive"):
        QuantizationArgs(strategy="block", block_structure=block_structure)


def test_infer_strategy():
    assert QuantizationArgs(group_size=128).strategy == "group"
    assert QuantizationArgs(group_size=-1).strategy == "channel"


def test_enums_case_insensitive():
    assert QuantizationArgs(
        type="int", strategy="group", actorder="weight", group_size=1
    ) == QuantizationArgs(type="InT", strategy="GROUP", actorder="weight",
                          group_size=1)


def test_actorder():
    args = QuantizationArgs(group_size=128, actorder="group")
    assert args.strategy == "group"
    args = QuantizationArgs(group_size=128, actorder="dynamic")
    assert args.strategy == "group"

    with pytest.raises(ValueError):
        QuantizationArgs(group_size=None, actorder="group")
    with pytest.raises(ValueError):
        QuantizationArgs(group_size=-1, actorder="group")
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="tensor", actorder="group")

    assert (QuantizationArgs(group_size=1, actorder=True).actorder
            == ActivationOrdering.GROUP)
    assert QuantizationArgs(group_size=1, actorder=False).actorder is None
    assert QuantizationArgs(group_size=1, actorder=None).actorder is None


def test_actorder_aliases():
    assert ActivationOrdering.GROUP == ActivationOrdering.DYNAMIC
    assert ActivationOrdering.WEIGHT == ActivationOrdering.STATIC
    assert ActivationOrdering.GROUP == "dynamic"
    assert ActivationOrdering.DYNAMIC == "group"
    assert ActivationOrdering.WEIGHT == "static"
    assert ActivationOrdering.STATIC == "weight"
    assert ActivationOrdering.WEIGHT != "dynamic"
    assert ActivationOrdering.STATIC != "group"
    assert ActivationOrdering.GROUP != "static"
    assert ActivationOrdering.DYNAMIC != "weight"


def test_args_invalid():
    with pytest.raises(ValidationError):
        QuantizationArgs(type="invalid")
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy="invalid")
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy="group")


def test_serialize_args():
    args = QuantizationArgs(num_bits=4, type="int", symmetric=True,
                            group_size=128, actorder="group")
    args_dict = args.model_dump()
    assert args_dict["num_bits"] == 4
    assert args_dict["type"] == "int"
    assert args_dict["symmetric"] is True
    assert args_dict["group_size"] == 128
    assert args_dict["strategy"] == "group"
    assert args_dict["actorder"] == "group"
    assert QuantizationArgs.model_validate(args_dict) == args


# --------------------------------------------------------------------------- #
# QuantizationScheme (ref test_quant_scheme.py)

def test_basic_scheme():
    targets = ["model.layer.0", "model.layer.3"]
    weights = QuantizationArgs()
    scheme = QuantizationScheme(targets=targets, weights=weights)
    assert scheme.targets == targets
    assert scheme.weights == weights
    assert scheme.input_activations is None
    assert scheme.output_activations is None
    assert scheme.format is None


def test_full_scheme():
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(),
        input_activations=QuantizationArgs(num_bits=8),
        output_activations=QuantizationArgs(num_bits=8, type="float",
                                            symmetric=False),
        format="float-quantized",
    )
    assert scheme.format == "float-quantized"
    assert scheme.output_activations.symmetric is False


def test_group_dynamic_input_activations_supported():
    """GROUP-strategy dynamic input activations must validate (handled by
    compute_dynamic_scales_and_zp; ref #758)."""
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, group_size=128),
        input_activations=QuantizationArgs(num_bits=8, strategy="group",
                                           group_size=128, dynamic=True),
    )
    assert scheme.input_activations.strategy == "group"
    assert scheme.input_activations.dynamic is True


def test_unsupported_activation_strategy_still_rejected():
    with pytest.raises((NotImplementedError, ValidationError)):
        QuantizationScheme(
            targets=["Linear"],
            input_activations=QuantizationArgs(num_bits=8,
                                               strategy="channel"),
        )


def test_scheme_needs_targets():
    with pytest.raises(ValidationError):
        QuantizationScheme()


def test_scheme_defaults():
    out = QuantizationScheme(targets=["Linear"])
    assert out.weights is None
    assert out.input_activations is None
    assert out.output_activations is None
    assert out.format is None


def test_serialize_scheme():
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, symmetric=True, group_size=128),
        input_activations=QuantizationArgs(num_bits=8, dynamic=True),
        output_activations=QuantizationArgs(num_bits=8, type="float",
                                            symmetric=False),
        format="pack-quantized",
    )
    scheme_dict = scheme.model_dump()
    assert scheme_dict["targets"] == ["Linear"]
    assert scheme_dict["format"] == "pack-quantized"
    assert scheme_dict["weights"]["num_bits"] == 4
    assert QuantizationScheme.model_validate(scheme_dict) == scheme


# --------------------------------------------------------------------------- #
# QuantizationConfig (ref test_quant_config.py)

def test_basic_config():
    config = QuantizationConfig(
        config_groups={"group_1": QuantizationScheme(targets=[])})
    assert config.quant_method == DEFAULT_QUANTIZATION_METHOD
    assert config.format == DEFAULT_QUANTIZATION_FORMAT
    assert config.quantization_status == QuantizationStatus.INITIALIZED
    assert config.global_compression_ratio is None
    assert isinstance(config.ignore, list) and len(config.ignore) == 0


def test_full_config():
    config = QuantizationConfig(
        config_groups={"group_1": QuantizationScheme(targets=[]),
                       "group_2": QuantizationScheme(targets=[])},
        global_compression_ratio=3.5,
        ignore=["model.layers.0"],
        quantization_status="compressed",
    )
    assert config.global_compression_ratio == 3.5
    assert config.ignore == ["model.layers.0"]
    assert config.quantization_status == QuantizationStatus.COMPRESSED


@pytest.mark.parametrize("scheme_name", ["W8A8", "W8A16", "W4A16", "FP8"])
def test_load_scheme_from_preset(scheme_name):
    """config_groups values may be preset-name -> target-list shorthand."""
    config = QuantizationConfig(config_groups={scheme_name: ["Linear"]})
    assert scheme_name in config.config_groups
    assert isinstance(config.config_groups[scheme_name], QuantizationScheme)
    assert config.config_groups[scheme_name].targets == ["Linear"]


def test_config_to_dict():
    config = QuantizationConfig(
        config_groups={
            "group_1": QuantizationScheme(
                targets=["Linear"],
                weights=QuantizationArgs(num_bits=4, symmetric=True,
                                         group_size=128)),
            "group_2": QuantizationScheme(
                targets=["Conv2d"], weights=QuantizationArgs(num_bits=8)),
        },
        global_compression_ratio=3.5,
        ignore=["model.layers.0"],
        quantization_status="compressed",
        format="int-quantized",
    )
    config_dict = config.to_dict()
    assert "config_groups" in config_dict
    assert config_dict["format"] == "int-quantized"
    assert config_dict["quantization_status"] == "compressed"
    assert QuantizationConfig.model_validate(config_dict) == config


def test_get_vllm_module_type():
    """MoE gates/routers alias to Linear (ref quant_config.py:370-382)."""
    assert get_vllm_module_type("ExpertMLP") == "ExpertMLP"
    assert get_vllm_module_type("Linear") == "Linear"
    assert get_vllm_module_type("DeepseekV4TopKRouter") == "Linear"
    assert get_vllm_module_type("JetMoeTopKGating") == "Linear"
    assert get_vllm_module_type("Qwen3NextGatedDeltaNet") == "Linear"


def test_quantization_config_merge():
    """merge appends config groups in order, drops newly-covered ignore
    entries, and takes the newer status (ref test_quantization_config_merge)."""
    config = QuantizationConfig(
        config_groups={"config_group_0": QuantizationScheme(
            targets=["re:.*self_attn.*"],
            weights=QuantizationArgs(num_bits=4, symmetric=True,
                                     group_size=128))},
        ignore=["lm_head", "model.layers.0.mlp.gate_proj", "re:.*mtp.*"],
        quantization_status=QuantizationStatus.INITIALIZED,
    )
    new_config = QuantizationConfig(
        config_groups={"config_group_0": QuantizationScheme(
            targets=["re:.*mlp.*"],
            weights=QuantizationArgs(num_bits=8, symmetric=False,
                                     group_size=128))},
        ignore=["lm_head"],
        quantization_status=QuantizationStatus.COMPRESSED,
    )
    config.merge(new_config)
    ordered = list(config.config_groups.values())
    assert len(ordered) == 2
    assert ordered[0].targets[0] == "re:.*self_attn.*"
    assert ordered[1].targets[0] == "re:.*mlp.*"
    assert set(config.ignore) == {"lm_head", "re:.*mtp.*"}
    assert config.quantization_status == QuantizationStatus.COMPRESSED


def test_requires_calibration_data():
    def cfg(observer=None):
        kwargs = {} if observer is None else {"observer": observer}
        return QuantizationConfig(config_groups={
            "group_1": QuantizationScheme(
                targets=["Linear"], weights=QuantizationArgs(**kwargs))})

    assert cfg("imatrix_mse").requires_calibration_data()
    assert not cfg().requires_calibration_data()


def test_status_comparison_operators():
    assert QuantizationStatus.INITIALIZED < QuantizationStatus.CALIBRATION
    assert QuantizationStatus.FROZEN > QuantizationStatus.CALIBRATION
    assert QuantizationStatus.COMPRESSED >= QuantizationStatus.FROZEN
    assert QuantizationStatus.INITIALIZED <= QuantizationStatus.INITIALIZED
