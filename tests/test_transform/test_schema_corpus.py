"""Transform schema corpus, ported from the reference's
tests/test_transform/{test_transform_args,test_transform_config,
test_transform_scheme}.py: construction defaults, singleton coercion,
multi-group configs, and dump/validate reloads."""

from compressed_tensors_tpu.transform import (
    TransformArgs,
    TransformConfig,
    TransformScheme,
)


def _basic_scheme():
    return TransformScheme(
        type="hadamard",
        apply=[TransformArgs(targets=["Embedding"], location="input")],
    )


def test_basic_args():
    args = TransformArgs(targets=["Embedding"], location="input")
    assert args.targets == ["Embedding"]
    assert args.location == "input"
    assert len(args.ignore) == 0


def test_args_full():
    args = TransformArgs(
        targets=["Linear"],
        location="weight_input",
        inverse=True,
        ignore=["model.layers.2"],
    )
    assert args.targets == ["Linear"]
    assert args.location == "weight_input"
    assert args.inverse is True
    assert args.ignore == ["model.layers.2"]


def test_singleton_targets():
    args = TransformArgs(targets="target", location="input", ignore="ignore")
    assert args.targets == ["target"]
    assert args.ignore == ["ignore"]


def test_basic_scheme():
    scheme = _basic_scheme()
    assert not scheme.randomize
    assert scheme.type == "hadamard"
    assert len(scheme.apply) == 1
    assert isinstance(scheme.apply[0], TransformArgs)


def test_scheme_multiple_groups_global():
    scheme = TransformScheme(
        type="hadamard",
        apply=[
            TransformArgs(targets=["Embedding"], location="input"),
            TransformArgs(targets=["Linear"], location="weight_input"),
        ],
        randomize=True,
    )
    assert scheme.randomize
    assert len(scheme.apply) == 2
    assert all(isinstance(a, TransformArgs) for a in scheme.apply)


def test_scheme_many_groups():
    apply = []
    for i in range(20):
        apply.append(TransformArgs(
            targets=[f"model.layers.{i}.attn.v_proj",
                     f"model.layers.{i}.attn.o_proj"],
            location="weight_output",
        ))
    scheme = TransformScheme(type="hadamard", apply=apply)
    assert len(scheme.apply) == 20


def test_config_basic():
    config = TransformConfig(config_groups={"transform_0": _basic_scheme()})
    assert isinstance(config.config_groups["transform_0"], TransformScheme)
    assert "config_groups" in config.model_dump()


def test_config_multiple_groups():
    s1 = TransformScheme(type="hadamard", apply=[TransformArgs(
        targets=["model.layers.0.attn.v_proj"], location="weight_input")])
    s2 = TransformScheme(type="hadamard", apply=[TransformArgs(
        targets=["model.layers.0.attn.q_proj"], location="weight_input")])
    TransformConfig(config_groups={"transform_0": s1, "transform_1": s2})


def test_config_reload():
    config = TransformConfig(config_groups={"transform_0": _basic_scheme()})
    assert config == TransformConfig.model_validate(config.model_dump())
