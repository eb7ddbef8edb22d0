"""PyTorch state-dict -> parameter-pytree conversion.

Migration tool for users of the reference PyTorch implementation: converts
``MAE`` / ``ViTOMR`` state dicts (reference layouts:
acai_omr/models/models.py:197-213, 381-428, 649-660) into this framework's
pytrees, including the ``frozen_blocks`` / ``fine_tune_blocks`` split of
``FineTuneOMREncoder`` (models.py:334-360), which maps back onto one stacked
layer array here. Also used by the parity test-suite to check numerics against
torch modules built with the public torch API.

Only numpy is required at conversion time; tensors are accepted as anything
with ``.detach()``/``.numpy()`` or as numpy arrays.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _dense(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"])}


def _norm(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _mha(sd, prefix):
    return {
        "in_kernel": _np(sd[prefix + ".in_proj_weight"]).T,
        "in_bias": _np(sd[prefix + ".in_proj_bias"]),
        "out": _dense(sd, prefix + ".out_proj"),
    }


def _stack(layers: list) -> dict:
    import jax
    import jax.numpy as jnp
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)


def encoder_layer_from_torch(sd, prefix: str) -> dict:
    return {
        "self_attn": _mha(sd, prefix + ".self_attn"),
        "norm1": _norm(sd, prefix + ".norm1"),
        "linear1": _dense(sd, prefix + ".linear1"),
        "linear2": _dense(sd, prefix + ".linear2"),
        "norm2": _norm(sd, prefix + ".norm2"),
    }


def decoder_layer_from_torch(sd, prefix: str) -> dict:
    return {
        "self_attn": _mha(sd, prefix + ".self_attn"),
        "norm1": _norm(sd, prefix + ".norm1"),
        "cross_attn": _mha(sd, prefix + ".multihead_attn"),
        "norm2": _norm(sd, prefix + ".norm2"),
        "linear1": _dense(sd, prefix + ".linear1"),
        "linear2": _dense(sd, prefix + ".linear2"),
        "norm3": _norm(sd, prefix + ".norm3"),
    }


def _layer_indices(sd, pattern: str):
    import re
    idxs = set()
    rx = re.compile(re.escape(pattern) + r"\.(\d+)\.")
    for k in sd:
        m = rx.search(k)
        if m:
            idxs.add(int(m.group(1)))
    return sorted(idxs)


def encoder_params_from_torch(sd, prefix: str = "") -> dict:
    """Encoder/OMREncoder/MAEEncoder state dict -> encoder pytree.

    Handles both the plain ``encoder_blocks`` layout and the
    ``frozen_blocks`` + ``fine_tune_blocks`` FineTune layout (concatenated in
    depth order; the final norm always lives on the last sub-stack).
    """
    p = prefix
    params = {
        "pos_embedding": _np(sd[p + "pos_embedding"]),
        "projection": _dense(sd, p + "projection"),
    }
    if any(k.startswith(p + "encoder_blocks.layers.") for k in sd):
        idxs = _layer_indices(sd, p + "encoder_blocks.layers")
        layers = [encoder_layer_from_torch(sd, f"{p}encoder_blocks.layers.{i}")
                  for i in idxs]
        params["final_norm"] = _norm(sd, p + "encoder_blocks.norm")
    else:
        layers = []
        for block in ("frozen_blocks", "fine_tune_blocks"):
            key = f"{p}{block}.layers"
            if any(k.startswith(key) for k in sd):
                layers += [encoder_layer_from_torch(sd, f"{key}.{i}")
                           for i in _layer_indices(sd, key)]
        params["final_norm"] = _norm(sd, p + "fine_tune_blocks.norm")
    params["blocks"] = _stack(layers)
    return params


def mae_params_from_torch(sd) -> dict:
    """Full MAE state dict (reference MAE module) -> MAE pytree."""
    idxs = _layer_indices(sd, "decoder.decoder_blocks.layers")
    dec_layers = [encoder_layer_from_torch(sd, f"decoder.decoder_blocks.layers.{i}")
                  for i in idxs]
    return {
        "encoder": encoder_params_from_torch(sd, "encoder."),
        "decoder_embed": _dense(sd, "decoder_embed"),
        "decoder_blocks": _stack(dec_layers),
        "decoder_norm": _norm(sd, "decoder.decoder_blocks.norm"),
        "decoder_unembed": _dense(sd, "decoder_unembed"),
        "mask_token": _np(sd["mask_token"]).reshape(-1),
        "decoder_pos_embedding": _np(sd["decoder_pos_embedding"]),
    }


def omr_decoder_params_from_torch(sd, prefix: str = "") -> dict:
    p = prefix
    idxs = _layer_indices(sd, p + "decoder_blocks.layers")
    layers = [decoder_layer_from_torch(sd, f"{p}decoder_blocks.layers.{i}")
              for i in idxs]
    return {
        "vocab_embedding": {"table": _np(sd[p + "vocab_embedding.weight"])},
        "pos_embedding": _np(sd[p + "pos_embedding"]),
        "blocks": _stack(layers),
        "final_norm": _norm(sd, p + "decoder_blocks.norm"),
        "unembed": _dense(sd, p + "unembed"),
    }


def vitomr_params_from_torch(sd) -> dict:
    """Full ViTOMR state dict (TeacherForced/ScheduledSampling/GRPO variants)
    -> ViTOMR pytree. The nn.Sequential transition head indices (0=linear1,
    3=linear2; reference models.py:655-660) map onto named leaves."""
    return {
        "encoder": encoder_params_from_torch(sd, "encoder."),
        "transition_head": {
            "linear1": _dense(sd, "transition_head.0"),
            "linear2": _dense(sd, "transition_head.3"),
        },
        "decoder": omr_decoder_params_from_torch(sd, "decoder."),
    }


# ---------------------------------------------------------------------------
# reverse direction: parameter pytree -> PyTorch state dict
# ---------------------------------------------------------------------------
# Exact inverses of the converters above, producing state dicts that load
# with ``strict=True`` into the reference's module layouts (reference:
# acai_omr/models/models.py:14-36 Encoder, 197-213 MAE, 378-428 OMRDecoder,
# 649-660 TeacherForcedViTOMR incl. the FineTuneOMREncoder frozen/fine-tune
# split, models.py:334-360). Used by the code-level token-identity proof
# (tools/reference_identity.py): our randomly initialized flagship params are
# loaded into the reference's own torch modules so both implementations can
# be run side by side on CPU. Values are numpy float32; callers wrap them in
# torch tensors.

def _unstack(stacked: dict, i: int) -> dict:
    import jax
    return jax.tree.map(lambda x: np.asarray(x[i], dtype=np.float32), stacked)


def _dense_sd(out, p, prefix):
    out[prefix + ".weight"] = np.asarray(p["kernel"], np.float32).T
    out[prefix + ".bias"] = np.asarray(p["bias"], np.float32)


def _norm_sd(out, p, prefix):
    out[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
    out[prefix + ".bias"] = np.asarray(p["bias"], np.float32)


def _mha_sd(out, p, prefix):
    out[prefix + ".in_proj_weight"] = np.asarray(p["in_kernel"], np.float32).T
    out[prefix + ".in_proj_bias"] = np.asarray(p["in_bias"], np.float32)
    _dense_sd(out, p["out"], prefix + ".out_proj")


def _encoder_layer_sd(out, layer, prefix):
    _mha_sd(out, layer["self_attn"], prefix + ".self_attn")
    _dense_sd(out, layer["linear1"], prefix + ".linear1")
    _dense_sd(out, layer["linear2"], prefix + ".linear2")
    _norm_sd(out, layer["norm1"], prefix + ".norm1")
    _norm_sd(out, layer["norm2"], prefix + ".norm2")


def _decoder_layer_sd(out, layer, prefix):
    _mha_sd(out, layer["self_attn"], prefix + ".self_attn")
    _mha_sd(out, layer["cross_attn"], prefix + ".multihead_attn")
    _dense_sd(out, layer["linear1"], prefix + ".linear1")
    _dense_sd(out, layer["linear2"], prefix + ".linear2")
    _norm_sd(out, layer["norm1"], prefix + ".norm1")
    _norm_sd(out, layer["norm2"], prefix + ".norm2")
    _norm_sd(out, layer["norm3"], prefix + ".norm3")


def encoder_state_dict_from_params(params: dict, prefix: str = "",
                                   fine_tune_depth: int | None = None) -> dict:
    """Encoder pytree -> reference Encoder/OMREncoder/FineTuneOMREncoder
    state dict. ``fine_tune_depth=None`` emits the plain ``encoder_blocks``
    layout; an int splits the stacked layers into ``frozen_blocks`` (first
    ``num_layers - fine_tune_depth``) + ``fine_tune_blocks`` exactly like the
    reference constructor (models.py:334-360; the final norm lives on
    fine_tune_blocks)."""
    out = {}
    out[prefix + "pos_embedding"] = np.asarray(params["pos_embedding"], np.float32)
    _dense_sd(out, params["projection"], prefix + "projection")
    num_layers = np.asarray(params["blocks"]["norm1"]["scale"]).shape[0]
    if fine_tune_depth is None:
        for i in range(num_layers):
            _encoder_layer_sd(out, _unstack(params["blocks"], i),
                              f"{prefix}encoder_blocks.layers.{i}")
        _norm_sd(out, params["final_norm"], prefix + "encoder_blocks.norm")
    else:
        num_frozen = num_layers - fine_tune_depth
        for i in range(num_frozen):
            _encoder_layer_sd(out, _unstack(params["blocks"], i),
                              f"{prefix}frozen_blocks.layers.{i}")
        for j in range(fine_tune_depth):
            _encoder_layer_sd(out, _unstack(params["blocks"], num_frozen + j),
                              f"{prefix}fine_tune_blocks.layers.{j}")
        _norm_sd(out, params["final_norm"], prefix + "fine_tune_blocks.norm")
    return out


def mae_state_dict_from_params(params: dict) -> dict:
    """MAE pytree -> reference ``MAE`` state dict (models.py:197-213)."""
    out = encoder_state_dict_from_params(params["encoder"], "encoder.")
    _dense_sd(out, params["decoder_embed"], "decoder_embed")
    n_dec = np.asarray(params["decoder_blocks"]["norm1"]["scale"]).shape[0]
    for i in range(n_dec):
        _encoder_layer_sd(out, _unstack(params["decoder_blocks"], i),
                          f"decoder.decoder_blocks.layers.{i}")
    _norm_sd(out, params["decoder_norm"], "decoder.decoder_blocks.norm")
    _dense_sd(out, params["decoder_unembed"], "decoder_unembed")
    out["mask_token"] = np.asarray(params["mask_token"], np.float32).reshape(1, 1, -1)
    out["decoder_pos_embedding"] = np.asarray(params["decoder_pos_embedding"],
                                              np.float32)
    return out


def omr_decoder_state_dict_from_params(params: dict, prefix: str = "") -> dict:
    out = {}
    out[prefix + "vocab_embedding.weight"] = np.asarray(
        params["vocab_embedding"]["table"], np.float32)
    out[prefix + "pos_embedding"] = np.asarray(params["pos_embedding"], np.float32)
    n = np.asarray(params["blocks"]["norm1"]["scale"]).shape[0]
    for i in range(n):
        _decoder_layer_sd(out, _unstack(params["blocks"], i),
                          f"{prefix}decoder_blocks.layers.{i}")
    _norm_sd(out, params["final_norm"], prefix + "decoder_blocks.norm")
    _dense_sd(out, params["unembed"], prefix + "unembed")
    return out


def vitomr_state_dict_from_params(params: dict,
                                  fine_tune_depth: int | None = None) -> dict:
    """ViTOMR pytree -> reference TeacherForced/GRPO ViTOMR state dict
    (models.py:649-660). ``fine_tune_depth`` selects the FineTuneOMREncoder
    key layout; None emits plain OMREncoder keys."""
    out = encoder_state_dict_from_params(params["encoder"], "encoder.",
                                         fine_tune_depth)
    _dense_sd(out, params["transition_head"]["linear1"], "transition_head.0")
    _dense_sd(out, params["transition_head"]["linear2"], "transition_head.3")
    out.update(omr_decoder_state_dict_from_params(params["decoder"], "decoder."))
    return out
