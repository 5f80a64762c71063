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
    match_named_parameters,
    match_quantizable_tensors,
    match_targets,
)


class Aliasable:
    """Enum mixin allowing member aliasing: equality and hashing route
    through a canonical alias map (ref utils/helpers.py:210)."""

    @staticmethod
    def get_aliases() -> dict:
        raise NotImplementedError()

    def __eq__(self, other):
        aliases = self.get_aliases()
        if isinstance(other, self.__class__):
            return self.value == other.value or (
                aliases.get(self.value, self.value)
                == aliases.get(other.value, other.value)
            )
        return aliases.get(self.value, self.value) == aliases.get(other, other)

    def __hash__(self):
        return hash(self.get_aliases().get(self.value, self.value))


class ParameterizedDefaultDict(dict):
    """dict whose missing values are built by calling a factory with the
    key (tuple keys splat as positional args); an optional attribute dict
    is applied to factory kwargs via ``with_factory_kwargs`` (ref
    utils/helpers.py:403). Used for per-size transform weight dedup."""

    def __init__(self, default_factory):
        self.default_factory = default_factory
        self._factory_kwargs = {}
        super().__init__()

    def __missing__(self, key):
        if isinstance(key, tuple):
            value = self.default_factory(*key, **self._factory_kwargs)
        else:
            value = self.default_factory(key, **self._factory_kwargs)
        self[key] = value
        return value

    def get(self, *args, factory_kwargs=None):
        """__getitem__ on the args tuple, with kwargs forwarded to the
        factory (reference `get` semantics)."""
        prev = self._factory_kwargs
        self._factory_kwargs = factory_kwargs or {}
        try:
            return self[args]
        finally:
            self._factory_kwargs = prev


def shard_tensor(tensor, shard_sizes: list, dim: int = 0) -> list:
    """Split a tensor into contiguous shards along ``dim``; sizes must sum
    to the dim length (ref utils/helpers.py:241)."""
    size = tensor.shape[dim]
    if sum(shard_sizes) != size:
        raise ValueError(
            "Sum of shard_sizes must equal the size of the tensor "
            "along the specified dimension."
        )
    shards = []
    start = 0
    for s in shard_sizes:
        idx = [slice(None)] * tensor.ndim
        idx[dim] = slice(start, start + s)
        shards.append(tensor[tuple(idx)])
        start += s
    return shards


def combine_shards(shards: list, dim: int = 0):
    """Concatenate decompressed shards along ``dim`` (ref
    utils/helpers.py:272)."""
    import jax.numpy as jnp

    if not shards:
        raise ValueError("The list of shards is empty.")
    if len({str(s.dtype) for s in shards}) > 1:
        raise ValueError("All shards must have the same dtype.")
    return jnp.concatenate(shards, axis=dim)


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
