from compressed_tensors_tpu.utils.dtypes import (  # noqa: F401
    SAFETENSORS_DTYPES,
    TensorDType,
    parse_dtype,
    serialize_dtype,
)
from compressed_tensors_tpu.utils.match import (  # noqa: F401
    ModuleInfo,
    is_match,
    is_narrow_match,
    match_modules_set,
    match_name,
    match_named_modules,
    match_quantizable_tensors,
    match_targets,
)


def getattr_chain(obj, chain: str, *args):
    """Chained getattr: getattr_chain(scheme, "weights.symmetric", True)
    (ref utils/helpers.py:149)."""
    if len(args) >= 1:
        has_default = True
        default = args[0]
    else:
        has_default = False
        default = None

    attr_names = chain.split(".")
    res = obj
    for attr_name in attr_names:
        if not hasattr(res, attr_name):
            if has_default:
                return default
            raise AttributeError(f"{res} object has no attribute {attr_name!r}")
        res = getattr(res, attr_name)
    return res
