"""Port of the reference's matching-semantics corpus
(/root/reference/tests/test_utils/test_match.py, 954 LoC) over this
package's model-free ModuleGraph abstraction: the same dummy model
structures, targets, ignore lists, fused mappings, narrow-match and
module-set grouping cases, expressed against ModuleInfo graphs instead of
torch modules."""

import logging

import pytest

from compressed_tensors_tpu.utils.match import (
    ModuleInfo,
    _match_class,
    get_lowest_common_ancestor_name,
    is_match,
    is_narrow_match,
    match_modules_set,
    match_name,
    match_named_modules,
    match_named_parameters,
    match_quantizable_tensors,
)

MOD = ModuleInfo(type_name="Module")
LINEAR = ModuleInfo(type_name="Linear", parent_classes=("Module",))
NORM = ModuleInfo(type_name="LayerNorm", parent_classes=("Module",))
ATTN = ModuleInfo(type_name="MultiheadAttention", parent_classes=("Module",))
INTERNAL_LINEAR = ModuleInfo(type_name="InternalLinear",
                             parent_classes=("Linear", "Module"),
                             is_internal=True)

FUSED = {
    "qkv_proj": ["q_proj", "k_proj", "v_proj"],
    "gate_up_proj": ["gate_proj", "up_proj"],
}


def dummy_model() -> dict:
    """The reference's DummyModel as a module graph, in named_modules
    order (parents before children)."""
    g = {"": ModuleInfo(type_name="DummyModel", parent_classes=("Module",)),
         "layer1": LINEAR, "layer2": LINEAR, "norm": NORM,
         "attention": ATTN, "transformer": MOD, "transformer.layers": MOD}
    for i in range(3):
        p = f"transformer.layers.{i}"
        g[p] = MOD
        g[f"{p}.self_attn"] = MOD
        for proj in ("q_proj", "k_proj", "v_proj"):
            g[f"{p}.self_attn.{proj}"] = LINEAR
        g[f"{p}.norm"] = NORM
        g[f"{p}.mlp"] = LINEAR
    return g


def dummy_moe_model(num_layers=2, num_experts=4) -> dict:
    g = {"": MOD, "layers": MOD}
    for i in range(num_layers):
        p = f"layers.{i}"
        g[p] = MOD
        g[f"{p}.post_attention_layernorm"] = NORM
        g[f"{p}.mlp"] = MOD
        g[f"{p}.mlp.experts"] = MOD
        for j in range(num_experts):
            e = f"{p}.mlp.experts.{j}"
            g[e] = MOD
            for proj in ("gate_proj", "up_proj", "down_proj"):
                g[f"{e}.{proj}"] = LINEAR
    return g


def llama_stories_graph(layers=6) -> dict:
    """Name skeleton of Xenova/llama2.c-stories15M (6 layers) — enough for
    the target-expansion cases the reference runs on the real checkpoint."""
    g = {"": MOD, "model": MOD, "model.layers": MOD}
    for i in range(layers):
        p = f"model.layers.{i}"
        g[p] = MOD
        g[f"{p}.self_attn"] = MOD
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            g[f"{p}.self_attn.{proj}"] = LINEAR
        g[f"{p}.mlp"] = MOD
        for proj in ("gate_proj", "up_proj", "down_proj"):
            g[f"{p}.mlp.{proj}"] = LINEAR
    g["lm_head"] = LINEAR
    return g


class TestMatchName:
    def test_exact_match(self):
        assert match_name("layer1", "layer1")
        assert not match_name("layer1", "layer2")
        assert match_name("transformer.layers.0.self_attn.q_proj",
                          "transformer.layers.0.self_attn.q_proj")

    def test_regex_match(self):
        assert match_name("layer1", "re:layer.*")
        assert match_name("layer1", "re:^layer1$")
        assert not match_name("layer1", "re:layer2")
        assert match_name("transformer.layers.0.self_attn.q_proj",
                          "re:.*q_proj")
        assert match_name(
            "transformer.layers.0.self_attn.q_proj",
            "re:transformer\\.layers\\.\\d+\\.self_attn\\..*_proj$",
        )

    def test_empty_strings(self):
        assert match_name("", "")
        assert not match_name("layer1", "")
        assert not match_name("", "layer1")

    def test_regex_special_characters(self):
        assert match_name("layer.1", "re:layer\\.1")
        assert match_name("layer.1", "re:layer.1")  # . matches any char
        assert match_name("layer_1", "re:layer_1")


class TestMatchClass:
    def test_direct_class_match(self):
        assert _match_class(LINEAR, "Linear")
        assert not _match_class(LINEAR, "Conv2d")
        assert _match_class(NORM, "LayerNorm")
        assert not _match_class(NORM, "BatchNorm1d")

    def test_parent_class_match(self):
        assert _match_class(LINEAR, "Module")
        conv = ModuleInfo(type_name="Conv2d",
                          parent_classes=("_ConvNd", "Module"))
        assert _match_class(conv, "Module")
        assert _match_class(conv, "_ConvNd")

    def test_custom_module(self):
        dummy = ModuleInfo(type_name="DummyModel",
                           parent_classes=("Module",))
        assert _match_class(dummy, "DummyModel")
        assert _match_class(dummy, "Module")

    def test_linear_base(self):
        """vLLM's LinearBase matches target "Linear"."""
        lb = ModuleInfo(type_name="LinearBase", parent_classes=("Module",))
        assert _match_class(lb, "Linear")


class TestIsMatch:
    def test_name_match(self):
        assert is_match("layer1", LINEAR, "layer1")
        assert not is_match("layer1", LINEAR, "layer2")

    def test_class_match(self):
        assert is_match("layer1", LINEAR, "Linear")
        assert not is_match("layer1", LINEAR, "Conv2d")

    def test_combined_match(self):
        assert is_match("layer1", LINEAR, "layer1")
        assert is_match("layer1", LINEAR, "Linear")
        assert not is_match("layer1", LINEAR, "layer2")

    def test_regex_in_name_match(self):
        assert is_match("layer1", LINEAR, "re:layer.*")
        assert not is_match("layer1", LINEAR, "re:conv.*")

    def test_internal_module_match(self):
        assert not is_match("layer1", INTERNAL_LINEAR, "re:layer.*")

    def test_fused_mapping(self):
        assert is_match("dummy.qkv_proj", LINEAR, "re:.*q_proj", fused=FUSED)
        assert is_match("dummy.qkv_proj", LINEAR, "re:.*k_proj", fused=FUSED)
        assert is_match("dummy.qkv_proj", LINEAR, "re:.*v_proj", fused=FUSED)
        assert is_match("dummy.qkv_proj", LINEAR, "Linear", fused=FUSED)
        assert is_match("dummy.gate_up_proj", LINEAR, "re:.*gate_proj",
                        fused=FUSED)
        assert is_match("dummy.gate_up_proj", LINEAR, "re:.*up_proj",
                        fused=FUSED)
        assert is_match("dummy.gate_up_proj", LINEAR, "Linear", fused=FUSED)


class TestMatchNamedModules:
    def test_exact_module_match(self):
        matches = list(match_named_modules(dummy_model(),
                                           ["layer1", "layer2"]))
        names = [name for name, _ in matches]
        assert names == ["layer1", "layer2"]

    def test_class_module_match(self):
        matches = list(match_named_modules(dummy_model(), ["Linear"]))
        # layer1, layer2, 3 layers x (q, k, v, mlp)
        assert len(matches) == 2 + 3 * 4
        assert all(m.type_name == "Linear" for _, m in matches)

    def test_regex_module_match(self):
        matches = list(match_named_modules(dummy_model(), ["re:.*linear.*"]))
        assert len(matches) == 0  # no module name contains "linear"

    def test_ignore_parameter(self):
        base = list(match_named_modules(dummy_model(), ["Linear"]))
        ignored = list(match_named_modules(dummy_model(), ["Linear"],
                                           ignore=["layer1"]))
        assert len(ignored) == len(base) - 1
        assert "layer1" not in [n for n, _ in ignored]

    def test_empty_targets(self):
        assert list(match_named_modules(dummy_model(), [])) == []

    def test_warn_on_fail(self, caplog):
        with caplog.at_level(logging.WARNING,
                             logger="compressed_tensors_tpu.utils.match"):
            list(match_named_modules(dummy_model(), ["nonexistent_module"],
                                     warn_on_fail=True))
        assert any("Could not match" in r.message
                   and "nonexistent_module" in r.message
                   for r in caplog.records)

    def test_internal_match(self):
        graph = {"layer1": INTERNAL_LINEAR}
        assert list(match_named_modules(graph, ["re:.*"])) == []

    @pytest.mark.parametrize(
        "targets, ignore, expected_targets",
        [
            (
                ["re:model.layers.[01].self_attn.q_proj"],
                ["re:model.layers.1.self_attn.q_proj"],
                {"model.layers.0.self_attn.q_proj"},
            ),
            (
                ["re:model.layers.[01].self_attn.q_proj"],
                [],
                {"model.layers.0.self_attn.q_proj",
                 "model.layers.1.self_attn.q_proj"},
            ),
            (
                ["re:model.layers.[0-2].self_attn.q_proj"],
                ["re:model.layers.1.self_attn.q_proj"],
                {"model.layers.0.self_attn.q_proj",
                 "model.layers.2.self_attn.q_proj"},
            ),
            (
                ["model.layers.0.self_attn.q_proj"],
                ["model.layers.0.self_attn.q_proj"],
                set(),
            ),
            (
                ["re:model.layers.*.self_attn.q_proj"],
                ["re:model.layers.[01].self_attn.q_proj"],
                {f"model.layers.{i}.self_attn.q_proj" for i in range(2, 6)},
            ),
        ],
    )
    def test_expand_targets_with_llama_stories(self, targets, ignore,
                                               expected_targets):
        expanded = {
            name for name, _ in
            match_named_modules(llama_stories_graph(), targets, ignore)
        }
        assert expanded == expected_targets


# parameter inventory for dummy_model (named_parameters(recurse=False))
def dummy_params() -> dict:
    p = {"layer1": ["weight", "bias"], "layer2": ["weight", "bias"],
         "norm": ["weight", "bias"],
         "attention": ["in_proj_weight", "in_proj_bias"]}
    for i in range(3):
        base = f"transformer.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj"):
            p[f"{base}.self_attn.{proj}"] = ["weight", "bias"]
        p[f"{base}.norm"] = ["weight", "bias"]
        p[f"{base}.mlp"] = ["weight", "bias"]
    return p


class TestMatchNamedParameters:
    def test_parameter_match(self):
        matches = list(match_named_parameters(
            dummy_model(), ["layer1.weight", "layer1.bias"],
            params=dummy_params()))
        assert [m[0] for m in matches] == ["layer1.weight", "layer1.bias"]

    def test_regex_parameter_match(self):
        matches = list(match_named_parameters(
            dummy_model(), ["re:.*weight$"], params=dummy_params()))
        weight_params = [n for n, _, _ in matches if n.endswith("weight")]
        assert len(weight_params) > 0

    def test_ignore_parameters(self):
        base = list(match_named_parameters(dummy_model(), ["re:.*weight$"],
                                           params=dummy_params()))
        ignored = list(match_named_parameters(
            dummy_model(), ["re:.*weight$"], ignore=["layer1.weight"],
            params=dummy_params()))
        assert len(ignored) < len(base)
        assert "layer1.weight" not in [n for n, _, _ in ignored]

    def test_parameter_return_values(self):
        matches = list(match_named_parameters(dummy_model(),
                                              ["layer1.weight"],
                                              params=dummy_params()))
        assert len(matches) == 1
        param_name, module_name, info = matches[0]
        assert param_name == "layer1.weight"
        assert module_name == "layer1"
        assert info.type_name == "Linear"

    def test_warn_on_fail_parameters(self, caplog):
        with caplog.at_level(logging.WARNING,
                             logger="compressed_tensors_tpu.utils.match"):
            list(match_named_parameters(dummy_model(), ["nonexistent.param"],
                                        warn_on_fail=True,
                                        params=dummy_params()))
        assert any("Could not match" in r.message
                   and "nonexistent.param" in r.message
                   for r in caplog.records)

    def test_internal_match(self):
        graph = {"layer1": INTERNAL_LINEAR}
        matches = list(match_named_parameters(
            graph, ["re:.*"], params={"layer1": ["weight"]}))
        assert matches == []

    def test_default_weight_params(self):
        """Without an explicit params mapping, every non-container module
        carries a single "weight" parameter."""
        matches = list(match_named_parameters(dummy_model(),
                                              ["re:.*\\.weight$"]))
        assert "layer1.weight" in [n for n, _, _ in matches]
        # containers contribute nothing
        assert all(not n.startswith("transformer.layers.0.weight")
                   for n, _, _ in matches)


class TestGetLowestCommonModuleName:
    def test_multiple_modules(self):
        assert get_lowest_common_ancestor_name(
            ["abc.a", "abc.b", "abc.c"]) == "abc"

    def test_single_module(self):
        assert get_lowest_common_ancestor_name(["abc.abc"]) == "abc.abc"

    def test_substring_modules(self):
        assert get_lowest_common_ancestor_name(["abc.abc", "abc.ab"]) == "abc"

    def test_parent_and_child_modules(self):
        assert get_lowest_common_ancestor_name(
            ["abc.abc.ab", "abc.abc"]) == "abc.abc"

    def test_root(self):
        assert get_lowest_common_ancestor_name(["abc.abc", "b.abc"]) == ""

    def test_ignore_none(self):
        assert get_lowest_common_ancestor_name(["abc.abc", None]) == "abc.abc"


class TestMatchModulesSet:
    def test_simple_module_set(self):
        targets = ["re:.*self_attn.q_proj$", "re:.*self_attn.k_proj$",
                   "re:.*self_attn.v_proj$"]
        matches = list(match_modules_set(dummy_model(), targets))
        assert len(matches) == 3  # one set per layer
        for module_set in matches:
            assert len(module_set) == 3
            assert all(len(names) == 1 for names in module_set)

    def test_moe_module_match(self):
        """Each expert becomes its own set (parent context differs)."""
        model = dummy_moe_model(num_layers=2, num_experts=4)
        matches = list(match_modules_set(
            model, ["re:.*gate_proj$", "re:.*up_proj$"]))
        assert len(matches) == 8  # 2 layers x 4 experts
        for gate_names, up_names in matches:
            assert len(gate_names) == 1 and len(up_names) == 1

    def test_moe_with_layernorm_match(self):
        """A layer-level member groups all experts of the layer."""
        model = dummy_moe_model(num_layers=2, num_experts=3)
        targets = ["re:.*post_attention_layernorm$", "re:.*gate_proj$",
                   "re:.*up_proj$"]
        matches = list(match_modules_set(model, targets))
        assert len(matches) == 2  # one group per layer
        for norm_names, gate_names, up_names in matches:
            assert len(norm_names) == 1
            assert len(gate_names) == 3
            assert len(up_names) == 3

    def test_module_set_ordering(self):
        targets = ["re:.*v_proj$", "re:.*self_attn.q_proj$",
                   "re:.*self_attn.k_proj$"]
        matches = list(match_modules_set(dummy_model(), targets))
        for module_set in matches:
            (v,), (q,), (k,) = module_set
            assert v.endswith("v_proj") and q.endswith("q_proj") \
                and k.endswith("k_proj")

    def test_incomplete_set_error(self):
        with pytest.raises(ValueError,
                           match="Found a final incomplete set"):
            list(match_modules_set(dummy_model(),
                                   ["layer1", "nonexistent_module"]))

    def test_empty_targets_set(self):
        assert list(match_modules_set(dummy_model(), [])) == []

    def test_module_set_with_ignore(self):
        targets = ["re:.*self_attn.q_proj$", "re:.*self_attn.k_proj$"]
        ignore = ["re:transformer.layers.0.*"]
        matches = list(match_modules_set(dummy_model(), targets,
                                         ignore=ignore))
        assert len(matches) == 2  # layers 1 and 2

    def test_internal_match(self):
        graph = {"layer1": INTERNAL_LINEAR}
        assert list(match_modules_set(graph, ["re:.*"])) == []


class TestIsNarrowMatch:
    def test_narrow_match_true_child_only(self):
        assert is_narrow_match(dummy_model(), r"re:.*q_proj$",
                               "transformer.layers.0.self_attn.q_proj")

    def test_narrow_match_false_when_parent_also_matches(self):
        assert not is_narrow_match(
            dummy_model(), r"re:transformer\.layers\.0\..*",
            "transformer.layers.0.self_attn.q_proj")

    def test_narrow_match_false_when_neither_matches(self):
        assert not is_narrow_match(
            dummy_model(), r"re:this_does_not_exist$",
            "transformer.layers.0.self_attn.q_proj")

    def test_narrow_match_iterable_targets_any_true(self):
        targets = [r"re:transformer\.layers\.0\..*", r"re:.*q_proj$"]
        assert is_narrow_match(dummy_model(), targets,
                               "transformer.layers.0.self_attn.q_proj")

    def test_narrow_match_top_level_behavior_documented(self):
        """Top-level names derive parent == "" which carries no match, but
        the reference's parent_name == name quirk makes parent mirror the
        child, so narrow is False. Mirror that contract."""
        assert not is_narrow_match(dummy_model(), r"re:^layer1$", "layer1")


class TestIntegration:
    def test_complex_model_matching(self):
        model = dummy_model()
        assert len(list(match_named_modules(model, ["re:.*q_proj$"]))) == 3
        assert len(list(match_named_modules(model, ["re:.*k_proj$"]))) == 3
        assert len(list(match_named_modules(model, ["re:.*v_proj$"]))) == 3

    def test_parameter_and_module_consistency(self):
        model = dummy_model()
        module_matches = list(match_named_modules(model, ["layer1"]))
        assert len(module_matches) == 1
        module_name, info = module_matches[0]
        param_matches = list(match_named_parameters(
            model, [f"{module_name}.weight"], params=dummy_params()))
        assert len(param_matches) == 1
        param_name, parent_name, parent_info = param_matches[0]
        assert parent_name == module_name
        assert parent_info is info

    def test_all_functions_with_regex(self):
        model = dummy_model()
        regex_target = "re:.*Linear.*"
        modules = list(match_named_modules(model, [regex_target]))
        params = list(match_named_parameters(model, [regex_target],
                                             params=dummy_params()))
        assert isinstance(modules, list)
        assert isinstance(params, list)


@pytest.fixture
def sample_tensors():
    """Name-keyed stand-ins for a model state dict (values unused by the
    matcher)."""
    return {
        "model.layers.0.self_attn.q_proj.weight": 0,
        "model.layers.0.self_attn.k_proj.weight": 0,
        "model.layers.0.self_attn.v_proj.weight": 0,
        "model.layers.0.mlp.gate_proj.weight": 0,
        "model.layers.0.mlp.up_proj.weight": 0,
        "model.layers.0.mlp.down_proj.weight": 0,
        "model.layers.0.input_layernorm.weight": 0,
        "model.layers.0.post_attention_layernorm.weight": 0,
        "model.embed_tokens.weight": 0,
        "lm_head.weight": 0,
        "model.layers.0.self_attn.q_proj.bias": 0,
    }


ALL_LINEAR_WEIGHTS = {
    "model.layers.0.self_attn.q_proj.weight",
    "model.layers.0.self_attn.k_proj.weight",
    "model.layers.0.self_attn.v_proj.weight",
    "model.layers.0.mlp.gate_proj.weight",
    "model.layers.0.mlp.up_proj.weight",
    "model.layers.0.mlp.down_proj.weight",
    "model.embed_tokens.weight",
    "lm_head.weight",
}


@pytest.mark.parametrize(
    "ignore,targets,param_targets,allow_nonquantizable,expected_names",
    [
        ([], [], ("weight",), False, ALL_LINEAR_WEIGHTS),
        (["re:.*self_attn.*"], [], ("weight",), False,
         {"model.layers.0.mlp.gate_proj.weight",
          "model.layers.0.mlp.up_proj.weight",
          "model.layers.0.mlp.down_proj.weight",
          "model.embed_tokens.weight", "lm_head.weight"}),
        (["re:.*self_attn.*", "re:.*mlp.*"], [], ("weight",), False,
         {"model.embed_tokens.weight", "lm_head.weight"}),
        ([], ["re:.*mlp.*gate_proj", "re:.*mlp.*up_proj"], ("weight",),
         False,
         {"model.layers.0.mlp.gate_proj.weight",
          "model.layers.0.mlp.up_proj.weight"}),
        ([], [], ("weight",), False, ALL_LINEAR_WEIGHTS),
        ([], ["Linear"], ("weight",), False, ALL_LINEAR_WEIGHTS),
        ([], [], ("weight", "bias"), True,
         ALL_LINEAR_WEIGHTS
         | {"model.layers.0.input_layernorm.weight",
            "model.layers.0.post_attention_layernorm.weight",
            "model.layers.0.self_attn.q_proj.bias"}),
        (["re:.*self_attn.*"], ["re:.*self_attn.*q_proj"], ("weight",),
         False, set()),
        ([], ["re:.*proj$"], ("weight",), False,
         {"model.layers.0.self_attn.q_proj.weight",
          "model.layers.0.self_attn.k_proj.weight",
          "model.layers.0.self_attn.v_proj.weight",
          "model.layers.0.mlp.gate_proj.weight",
          "model.layers.0.mlp.up_proj.weight",
          "model.layers.0.mlp.down_proj.weight"}),
    ],
    ids=["basic_matching", "ignore_attention", "ignore_attention_and_mlp",
         "target_mlp_gate_up", "empty_targets", "linear_targets",
         "allow_nonquantizable", "ignore_precedence", "regex_all_proj"],
)
def test_match_quantizable_tensors(sample_tensors, ignore, targets,
                                   param_targets, allow_nonquantizable,
                                   expected_names):
    matches = list(match_quantizable_tensors(
        sample_tensors, ignore=ignore, targets=targets,
        param_targets=param_targets,
        allow_nonquantizable=allow_nonquantizable))
    result_names = {full_name for _, full_name in matches}
    assert result_names == expected_names
    for module_name, full_name in matches:
        assert full_name.rsplit(".", 1)[0] == module_name
