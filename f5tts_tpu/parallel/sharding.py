"""Partition rules: backbone parameter pytrees -> PartitionSpecs on ('data', 'model').

Megatron-style tensor parallelism for the transformer blocks (the reference has
no TP at all — SURVEY §2.4): QKV and FF-in are column-parallel (shard the
output/feature axis over ``model``), attn-out and FF-out are row-parallel
(shard the input axis; XLA inserts the psum). AdaLN modulation, embeddings and
projections are small and stay replicated. Stacked-scan block params carry a
leading ``depth`` axis, so specs are prefixed with ``None``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dit_param_specs(params) -> dict:
    """Spec pytree matching a backbone's structure (DiT ``blocks`` stack or
    UNetT ``first_half``/``second_half`` stacks); keyed on the shared module
    names ``attn``/``ff``/``to_out``/``in``."""

    def spec_for(path: tuple[str, ...], leaf) -> P:
        keys = [getattr(p, "key", None) for p in path]
        stacked = (
            any(k in keys for k in ("blocks", "first_half", "second_half"))
            and "text_embed" not in keys
        )
        ndim = leaf.ndim

        def with_depth(*s):
            return P(*((None,) + s)) if stacked else P(*s)

        if "attn" in keys:
            if "to_out" in keys:
                # row-parallel: w (in=inner, out=dim) shard inner; bias replicated
                return with_depth("model", None) if ndim - stacked == 2 else with_depth(None)
            # column-parallel q/k/v: w (in=dim, out=inner) shard out; bias shard
            return with_depth(None, "model") if ndim - stacked == 2 else with_depth("model")
        if "ff" in keys:
            if "in" in keys:
                return with_depth(None, "model") if ndim - stacked == 2 else with_depth("model")
            return with_depth("model", None) if ndim - stacked == 2 else with_depth(None)
        # everything else (adaln, embeddings, convs, norms) replicated
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, specs=None):
    specs = specs if specs is not None else dit_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def vocos_param_specs(params) -> dict:
    """Vocos is small (~13M); replicate everything."""
    return jax.tree.map(lambda x: P(), params)
