"""Target-matching semantics (ports the key cases from reference
tests/test_utils/test_match.py, 954 LoC of specification)."""

import pytest

from compressed_tensors_tpu.utils.match import (
    ModuleInfo,
    get_lowest_common_ancestor_name,
    is_match,
    is_narrow_match,
    match_modules_set,
    match_name,
    match_named_modules,
    match_targets,
)

LINEAR = ModuleInfo(type_name="Linear")
EMBEDDING = ModuleInfo(type_name="Embedding")
NORM = ModuleInfo(type_name="RMSNorm")
ATTN = ModuleInfo(type_name="LlamaAttention")
INTERNAL = ModuleInfo(type_name="Linear", is_internal=True)


def tiny_model(layers=2):
    """A llama-shaped module graph."""
    modules = {"": ModuleInfo("LlamaForCausalLM"),
               "model": ModuleInfo("LlamaModel"),
               "model.embed_tokens": EMBEDDING}
    for i in range(layers):
        p = f"model.layers.{i}"
        modules[p] = ModuleInfo("LlamaDecoderLayer")
        modules[f"{p}.self_attn"] = ATTN
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            modules[f"{p}.self_attn.{proj}"] = LINEAR
        modules[f"{p}.mlp"] = ModuleInfo("LlamaMLP")
        for proj in ("gate_proj", "up_proj", "down_proj"):
            modules[f"{p}.mlp.{proj}"] = LINEAR
        modules[f"{p}.input_layernorm"] = NORM
    modules["lm_head"] = LINEAR
    return modules


class TestMatchName:
    def test_exact(self):
        assert match_name("model.layers.0.q_proj", "model.layers.0.q_proj")
        assert not match_name("model.layers.0.q_proj", "model.layers.0.k_proj")

    def test_regex(self):
        assert match_name("model.layers.0.q_proj", r"re:.*q_proj$")
        assert match_name("model.layers.0.q_proj", r"re:model\.layers\.\d+.*")
        assert not match_name("model.layers.0.q_proj", r"re:.*k_proj$")

    def test_regex_anchors_at_start(self):
        # re.match anchors at start only
        assert match_name("model.layers.0", r"re:model")
        assert not match_name("xmodel.layers.0", r"re:model")

    def test_fused_mapping(self):
        fused = {"qkv_proj": ["q_proj", "k_proj", "v_proj"]}
        assert match_name("model.layers.0.qkv_proj", r"re:.*k_proj$", fused)
        assert match_name("model.layers.0.qkv_proj", r"re:.*q_proj$", fused)
        assert not match_name("model.layers.0.qkv_proj", r"re:.*o_proj$", fused)


class TestIsMatch:
    def test_class_match(self):
        assert is_match("foo", LINEAR, "Linear")
        assert not is_match("foo", NORM, "Linear")

    def test_linear_base_exception(self):
        vllm_linear = ModuleInfo(type_name="RowParallelLinear",
                                 parent_classes=("LinearBase", "Module"))
        assert is_match("foo", vllm_linear, "Linear")

    def test_internal_never_matches(self):
        assert not is_match("foo", INTERNAL, "Linear")
        assert not is_match("foo", INTERNAL, "foo")

    def test_ignore(self):
        assert not is_match("lm_head", LINEAR, "Linear", ignore=["lm_head"])
        assert not is_match("lm_head", LINEAR, "Linear", ignore=[r"re:.*head"])


class TestMatchNamedModules:
    def test_targets_and_ignore(self):
        model = tiny_model()
        matches = dict(match_named_modules(model, ["Linear"], ignore=["lm_head"]))
        assert "lm_head" not in matches
        assert "model.layers.0.self_attn.q_proj" in matches
        assert "model.embed_tokens" not in matches
        assert len(matches) == 14

    def test_regex_target(self):
        model = tiny_model()
        matches = list(match_named_modules(model, [r"re:.*\.mlp\..*proj$"]))
        assert len(matches) == 6

    def test_order_follows_model(self):
        model = tiny_model()
        names = [n for n, _ in match_named_modules(model, ["Linear"])]
        assert names == [n for n in model if n in set(names)]


class TestMatchTargets:
    def test_priority_order(self):
        # exact > regex > class
        targets = ["Linear", r"re:.*q_proj$", "model.layers.0.self_attn.q_proj"]
        matched = match_targets("model.layers.0.self_attn.q_proj", LINEAR, targets)
        assert matched == [
            "model.layers.0.self_attn.q_proj",
            r"re:.*q_proj$",
            "Linear",
        ]

    def test_internal_empty(self):
        assert match_targets("x", INTERNAL, ["Linear", "x"]) == []


class TestLowestCommonAncestor:
    def test_cases(self):
        assert get_lowest_common_ancestor_name(["abc.a", "abc.b"]) == "abc"
        assert get_lowest_common_ancestor_name(["abc"]) == "abc"
        assert get_lowest_common_ancestor_name(["abc", "ab"]) == ""
        assert get_lowest_common_ancestor_name(["ab", "ab.a"]) == "ab"
        assert get_lowest_common_ancestor_name([None, "ab.a"]) == "ab.a"
        assert get_lowest_common_ancestor_name([]) == ""


class TestMatchModulesSet:
    def test_qkv_sets(self):
        model = tiny_model(layers=3)
        sets = list(match_modules_set(model, ["q_proj_t", "k_proj_t", "v_proj_t"]))
        # no matches at all -> no yields
        assert sets == []

        sets = list(
            match_modules_set(
                model, [r"re:.*q_proj$", r"re:.*k_proj$", r"re:.*v_proj$"]
            )
        )
        assert len(sets) == 3
        for i, group in enumerate(sets):
            assert group[0] == [f"model.layers.{i}.self_attn.q_proj"]
            assert group[1] == [f"model.layers.{i}.self_attn.k_proj"]
            assert group[2] == [f"model.layers.{i}.self_attn.v_proj"]

    def test_incomplete_set_raises(self):
        model = tiny_model(layers=1)
        with pytest.raises(ValueError):
            list(
                match_modules_set(
                    model, [r"re:.*q_proj$", "does.not.exist", r"re:.*v_proj$"]
                )
            )


class TestNarrowMatch:
    def test_attention_narrow(self):
        model = tiny_model()
        # regex targeting the attention module matches it but not its children
        assert is_narrow_match(model, r"re:.*self_attn$",
                               "model.layers.0.self_attn")
        # a regex matching both attn and its children is not narrow
        assert not is_narrow_match(model, r"re:.*self_attn.*",
                                   "model.layers.0.self_attn")
