"""Transform application: fused (offline) weight transforms + online
transform specs for the engine.

Functional analogue of `transform/factory/base.py:42-211` + `apply.py:14-70`:
- WEIGHT_INPUT / WEIGHT_OUTPUT are fused into weights (and bias for
  WEIGHT_OUTPUT: y' = R W x + R b, ref factory/base.py:127-146) on host in
  float64, exactly like the reference's fused path.
- INPUT / OUTPUT / K_CACHE / Q_ATTN are online: this module returns
  OnlineTransform entries the engine applies at runtime in the scheme's
  precision.
- Transform weights are deduplicated per (size, scheme), mirroring the
  reference's ParameterizedDefaultDict caches.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import numpy as np

from compressed_tensors_tpu.registry import RegistryMixin
from compressed_tensors_tpu.transform.hadamard import (
    deterministic_hadamard_matrix,
    hadamard_matrix,
    high_precision_invert,
    random_hadamard_matrix,
    random_matrix,
)
from compressed_tensors_tpu.transform.schemas import (
    TransformArgs,
    TransformConfig,
    TransformLocation,
    TransformScheme,
)
from compressed_tensors_tpu.utils.match import ModuleInfo, is_match

__all__ = [
    "TransformFactory",
    "HadamardFactory",
    "RandomHadamardFactory",
    "RandomMatrixFactory",
    "OnlineTransform",
    "apply_transform_config",
    "apply_transform_weight",
    "get_transform_size",
    "multihead_matmul",
]


def get_transform_size(
    module_type: str,
    location: TransformLocation | str,
    weight_shape: tuple[int, ...],
    head_dim: int | None = None,
) -> int:
    """Size of the transform matrix for a module/location
    (ref utils/matrix.py:11-49)."""
    location = TransformLocation(location)
    size = None
    if module_type == "Linear":
        # weight (out_features, in_features)
        if location in (TransformLocation.INPUT,
                        TransformLocation.WEIGHT_INPUT):
            size = weight_shape[1]
        else:
            size = weight_shape[0]
    elif module_type == "Embedding":
        # weight (num_embeddings, embedding_dim)
        if location in (TransformLocation.INPUT,
                        TransformLocation.WEIGHT_INPUT):
            size = weight_shape[0]
        else:
            size = weight_shape[1]
    elif head_dim is None:
        raise NotImplementedError(
            f"Transforms on {module_type} are not supported without head_dim"
        )

    if head_dim is not None:
        if size is not None and size % head_dim != 0:
            raise ValueError(
                f"{head_dim} must divide {size} for {module_type} at "
                f"{location}"
            )
        size = head_dim
    return size


def multihead_matmul(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """A @ B with block-diagonal broadcasting when the shared dim differs
    (ref utils/matrix.py:126-158)."""
    if A.shape[-1] > B.shape[-2]:
        head_dim = B.shape[-2]
        num_heads = A.shape[-1] // head_dim
        A2 = A.reshape(*A.shape[:-1], num_heads, head_dim)
        out = A2 @ B
        return out.reshape(*out.shape[:-2], num_heads * out.shape[-1])
    elif A.shape[-1] < B.shape[-2]:
        head_dim = A.shape[-1]
        num_heads = B.shape[-2] // head_dim
        B2 = B.reshape(*B.shape[:-2], num_heads, head_dim, B.shape[-1])
        out = A @ B2
        return out.reshape(*out.shape[:-3], out.shape[-3] * out.shape[-2],
                           out.shape[-1])
    return A @ B


def apply_transform_weight(
    transform_weight: np.ndarray,
    value: np.ndarray,
    location: TransformLocation | str,
    module_type: str,
) -> np.ndarray:
    """Apply a transform weight to a value per location/module type
    (ref utils/matrix.py:51-124). With y = x W^T:
    xh = x V, Wh = U^T W Vi^T, yh = y U."""
    location = TransformLocation(location)
    assert transform_weight.shape[-2] == transform_weight.shape[-1]

    if location.is_online():
        return multihead_matmul(value, transform_weight)

    if module_type == "Linear":
        if location == TransformLocation.WEIGHT_INPUT:
            return multihead_matmul(value, transform_weight.T)
        elif location == TransformLocation.WEIGHT_OUTPUT:
            return multihead_matmul(transform_weight.T, value)
    elif module_type == "Embedding":
        if location == TransformLocation.WEIGHT_INPUT:
            return multihead_matmul(transform_weight, value)
        elif location == TransformLocation.WEIGHT_OUTPUT:
            return multihead_matmul(value, transform_weight)

    raise NotImplementedError(
        f"Applying transforms to {module_type} {location} is not supported"
    )


@dataclasses.dataclass
class OnlineTransform:
    """A runtime transform the engine applies to activations."""

    weight: np.ndarray
    location: str
    module_type: str
    precision: np.dtype
    scale: float = 1.0  # 1/sqrt(n) normalization for hadamard


class TransformFactory(RegistryMixin):
    """Creates transform weights for a scheme. Weights of the same size are
    deduplicated (shared) unless scheme.randomize."""

    normalize = False  # hadamard factories divide by sqrt(n) at apply

    def __init__(self, name: str, scheme: TransformScheme,
                 seed: int | None = None):
        self.name = name
        self.scheme = scheme
        self.seed = seed or 0
        self._weights: dict[int, np.ndarray] = {}
        self._count = 0

    @classmethod
    def from_scheme(cls, scheme: TransformScheme, name: str,
                    seed: int | None = None) -> "TransformFactory":
        factory_cls = TransformFactory.get_value_from_registry(scheme.type)
        return factory_cls(name, scheme, seed)

    def _construct(self, size: int, seed: int) -> np.ndarray:
        raise NotImplementedError

    def get_weight(self, size: int) -> np.ndarray:
        """Weights are deduplicated per size for every factory type — the
        reference keys its ParameterizedDefaultDict caches by (size, dtype,
        device), so same-size transforms share one weight regardless of
        randomize (factory/base.py; randomize only changes HOW the shared
        weight is constructed/permuted)."""
        if size not in self._weights:
            self._weights[size] = self._construct(size, self.seed)
        return self._weights[size]

    def inverse(self, weight: np.ndarray) -> np.ndarray:
        return high_precision_invert(weight)


@TransformFactory.register("hadamard")
class HadamardFactory(TransformFactory):
    normalize = True

    def _construct(self, size: int, seed: int) -> np.ndarray:
        if (size & (size - 1)) == 0:
            return deterministic_hadamard_matrix(size, dtype=np.float64)
        return hadamard_matrix(size, dtype=np.float64)

    def get_weight(self, size: int) -> np.ndarray:
        """Deterministic base weight, deduplicated by size; randomize
        applies a symmetric permutation H[perm][:, perm], keyed per weight
        (= per size) exactly like the reference (factory/hadamard.py:52-69
        keys `perms` by the shared weight Parameter) — every transform
        built from the same-size weight sees the same permutation, so
        inverse pairs stay consistent. The permuted matrix stays Hadamard
        and its normalized inverse stays the transpose."""
        if size not in self._weights:
            weight = self._construct(size, self.seed)
            if self.scheme.randomize:
                rng = np.random.default_rng(self.seed + size)
                perm = rng.permutation(size)
                weight = weight[perm][:, perm]
            self._weights[size] = weight
        return self._weights[size]

    def inverse(self, weight: np.ndarray) -> np.ndarray:
        # hadamard inverse (after 1/sqrt(n) normalization) is the transpose
        return weight.T


@TransformFactory.register("random-hadamard")
class RandomHadamardFactory(HadamardFactory):
    def _construct(self, size: int, seed: int) -> np.ndarray:
        return random_hadamard_matrix(size, seed=seed, dtype=np.float64)


@TransformFactory.register("random-matrix")
class RandomMatrixFactory(TransformFactory):
    def _construct(self, size: int, seed: int) -> np.ndarray:
        return random_matrix(size, seed=seed, dtype=np.float64)


def apply_transform_config(
    module_states: Mapping[str, dict],
    modules: Mapping[str, ModuleInfo],
    config: TransformConfig,
    seed: int | None = None,
    head_dims: Mapping[str, int] | None = None,
) -> tuple[dict[str, dict], dict[str, list[OnlineTransform]]]:
    """Apply a transform config.

    Fuses offline (WEIGHT_*) transforms into the module weights (float64,
    like the reference) and collects online transforms for the engine.

    :param module_states: name -> {"weight": array, ["bias": array]} with
        *dense* weights (transforms apply before quantization/compression)
    :return: (updated module states, name -> [OnlineTransform])
    """
    new_states = {k: dict(v) for k, v in module_states.items()}
    online: dict[str, list[OnlineTransform]] = {}

    for name, scheme in config.config_groups.items():
        factory = TransformFactory.from_scheme(scheme, name=name, seed=seed)

        for args in scheme.apply:
            for mod_name, info in modules.items():
                if not is_match(mod_name, info, args.targets, args.ignore):
                    continue
                state = new_states.get(mod_name)
                weight = state.get("weight") if state else None
                loc = TransformLocation(args.location)
                attn_online = loc in (TransformLocation.Q_ATTN,
                                      TransformLocation.K_CACHE)
                if weight is None and not (attn_online
                                           and scheme.head_dim is not None):
                    # weightless modules (attention containers) can only
                    # take per-head online q/k transforms sized by head_dim
                    continue
                w = np.asarray(weight) if weight is not None else None
                size = get_transform_size(
                    info.type_name, args.location,
                    w.shape if w is not None else None, scheme.head_dim
                )
                tw = factory.get_weight(size)
                if args.inverse:
                    tw = factory.inverse(tw)
                norm = (1.0 / np.sqrt(size)) if factory.normalize else 1.0

                if not args.is_online():
                    # fused offline in float64 (ref: fused always fp64)
                    fused = apply_transform_weight(
                        tw, w.astype(np.float64), args.location,
                        info.type_name,
                    ) * norm
                    state["weight"] = fused.astype(w.dtype)
                    # bias fuses for WEIGHT_OUTPUT: y' = R W x + R b
                    bias = state.get("bias")
                    if (bias is not None and
                            TransformLocation(args.location)
                            == TransformLocation.WEIGHT_OUTPUT):
                        b = np.asarray(bias).astype(np.float64)
                        state["bias"] = (
                            multihead_matmul(tw.T, b[:, None])[:, 0] * norm
                        ).astype(np.asarray(bias).dtype)
                else:
                    online.setdefault(mod_name, []).append(
                        OnlineTransform(
                            weight=tw.astype(
                                np.dtype(scheme.precision)
                                if np.dtype(scheme.precision)
                                != np.dtype(np.float64)
                                else np.float32
                            ),
                            location=str(
                                TransformLocation(args.location).value
                            ),
                            module_type=info.type_name,
                            precision=np.dtype(scheme.precision),
                            scale=norm,
                        )
                    )

    return new_states, online
