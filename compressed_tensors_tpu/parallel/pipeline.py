"""Pipeline parallelism: GPipe-style microbatched inference over the "pp"
mesh axis.

TPU-first design: the layer stack is grouped into `pp` stages whose stacked
params are sharded on their leading (stage) dim, and the schedule runs inside
`jax.shard_map` manual over "pp" only — every other mesh axis (dp/tp/ep/sp)
stays automatic, so GSPMD still inserts the tensor-parallel collectives
inside each stage while activations hop stages over ICI via `ppermute`.

The reference has no pipeline parallelism (its distributed layer is work
partitioning + weight replication, SURVEY.md §2.10); this is engine-side
capability with no counterpart to mirror.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import (
    _attention,
    _mlp,
    _rope,
    padded_head_dim,
    rms_norm,
)
from compressed_tensors_tpu.ops.linear import QuantizedTensor, quantized_matmul

__all__ = ["stack_stage_params", "pipeline_forward"]


def stack_stage_params(layers: list[dict], n_stages: int):
    """Group `layers` into `n_stages` contiguous stages and stack their
    params: every array leaf becomes (n_stages, layers_per_stage, ...).

    Requires len(layers) % n_stages == 0 and an identical pytree structure
    (same schemes/fusions) across layers — bucket mixed-scheme models by
    scheme before pipelining.
    """
    L = len(layers)
    if L % n_stages != 0:
        raise ValueError(f"{L} layers not divisible into {n_stages} stages")
    lps = L // n_stages
    stages = []
    for s in range(n_stages):
        group = layers[s * lps:(s + 1) * lps]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *group))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def _stage_forward(stage_params, x, positions, config: LlamaConfig,
                   layers_per_stage: int):
    """Run one pipeline stage (its `layers_per_stage` decoder layers) on one
    microbatch. Fresh local KV buffers per call (prefill semantics)."""
    B, S, H = x.shape
    KVH = config.num_key_value_heads
    Dp = padded_head_dim(config.head_dim)
    s_pad = int(np.ceil(S / 8) * 8)
    cos, sin = _rope(positions, config.head_dim, config.rope_theta)
    kv_k = jnp.zeros((layers_per_stage, B, KVH, s_pad, Dp), dtype=x.dtype)
    kv_v = jnp.zeros_like(kv_k)
    cache_lens = jnp.zeros((B,), dtype=jnp.int32)

    for j in range(layers_per_stage):
        layer = jax.tree.map(lambda a: a[j], stage_params)
        h = rms_norm(x, layer["input_layernorm"], config.rms_norm_eps)
        attn, kv_k, kv_v = _attention(layer, j, h, cos, sin, kv_k, kv_v,
                                      cache_lens, config, positions,
                                      fresh_prefill=True)
        x = x + attn
        h = rms_norm(x, layer["post_attention_layernorm"],
                     config.rms_norm_eps)
        x = x + _mlp(layer, h, config)
    return x


def pipeline_forward(
    params: dict,
    config: LlamaConfig,
    input_ids: jnp.ndarray,   # (B, S)
    positions: jnp.ndarray,   # (B, S)
    mesh,
    n_microbatches: int | None = None,
):
    """Full forward with the decoder trunk pipelined over mesh axis "pp".

    `params` must hold "stages" from `stack_stage_params` (leading dim
    sharded over "pp") plus the usual embed/norm/lm_head. Batch dim must be
    divisible by n_microbatches (default: pp size).
    """
    from jax.sharding import PartitionSpec as P

    n_stages = mesh.shape["pp"]
    M = n_microbatches or max(n_stages, 1)
    B, S = input_ids.shape
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    mb = B // M
    H = config.hidden_size
    lps = config.num_hidden_layers // n_stages

    embed = params["embed_tokens"]
    if isinstance(embed, QuantizedTensor):
        from compressed_tensors_tpu.ops.linear import materialize_weight

        embed = materialize_weight(embed)
    x = jnp.take(embed, input_ids, axis=0)  # (B, S, H)

    x_mbs = x.reshape(M, mb, S, H)
    pos_mbs = positions.reshape(M, mb, S)

    def schedule(stage_params, x_mbs, pos_mbs):
        # manual over "pp": leaves of stage_params are (1, lps, ...) local
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        stage = jax.lax.axis_index("pp")
        is_first = stage == 0
        is_last = stage == n_stages - 1

        recv = jnp.zeros((mb, S, H), dtype=x_mbs.dtype)
        outputs = jnp.zeros((M, mb, S, H), dtype=x_mbs.dtype)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for t in range(M + n_stages - 1):
            m_in = min(t, M - 1)
            inp = jnp.where(is_first, x_mbs[m_in], recv)
            # stage s processes microbatch (t - s) at step t
            m_here = jnp.clip(t - stage, 0, M - 1)
            pos = jnp.take(pos_mbs, m_here, axis=0)
            out = _stage_forward(stage_params, inp, pos, config, lps)
            if t >= n_stages - 1:
                m_out = t - (n_stages - 1)
                outputs = outputs.at[m_out].set(
                    jnp.where(is_last, out, jnp.zeros_like(out))
                )
            if t < M + n_stages - 2:
                recv = jax.lax.ppermute(out, "pp", fwd)
        # replicate the last stage's outputs to every pp rank
        return jax.lax.psum(outputs, "pp")

    sharded_schedule = jax.shard_map(
        schedule,
        mesh=mesh,
        in_specs=(P("pp"), P(), P()),
        out_specs=P(),
        axis_names={"pp"},
        check_vma=False,
    )
    x = sharded_schedule(params["stages"], x_mbs, pos_mbs)
    x = x.reshape(B, S, H)

    x = rms_norm(x, params["norm"], config.rms_norm_eps)
    lm_head = params["lm_head"]
    if isinstance(lm_head, QuantizedTensor):
        logits = quantized_matmul(x, lm_head)
    else:
        logits = jax.lax.dot_general(
            x, lm_head,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return logits
