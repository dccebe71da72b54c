"""Expert-parallel scaling: executed virtual-mesh dispatch + ICI-model
prediction for the v5e-16 MoE serving story (BASELINE config 5).

The round-4 MoE section's conclusion — "the lever that actually moves MoE
serving is expert parallelism across chips" — gets its evidence here:

1. EXECUTED: `parallel/ep.py moe_layer_ep` on a virtual 8-device CPU mesh
   (experts sharded, capacity grids exchanged with lax.all_to_all),
   checked for parity against the single-device `models/moe.py` routed
   layer. This is the same code path a real pod would run; only the
   fabric differs.
2. PREDICTED: per-chip decode step time for the serving-scale MoE
   (2.51B total / 0.85B active INT8) at EP = 1..16 on v5e ICI
   (specs/ici.py cost model). EP splits the EXPERT weight stream E/chips
   ways and the request batch data-parallel; non-expert weights
   replicate. Comm = 2 all_to_alls of the local (E, C, D) capacity grid
   per MoE layer.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/ep_scaling.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

# force the virtual CPU mesh BEFORE jax import — the axon sitecustomize
# re-sets JAX_PLATFORMS at interpreter start, so an env prefix on the
# command line is not enough (same trick as conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def executed_virtual_mesh():
    import jax
    import jax.numpy as jnp

    from physics_llm_inference_tpu.models import (ModelConfig, MoEConfig,
                                                  init_moe_params, moe_layer)
    from physics_llm_inference_tpu.parallel import make_mesh
    from physics_llm_inference_tpu.parallel.ep import moe_layer_ep

    assert len(jax.devices()) >= 8, \
        "run with xla_force_host_platform_device_count=8"
    mesh = make_mesh(data=1, expert=8, model=1)
    # no-drop capacity: EP computes capacity from its LOCAL token count,
    # so a tight factor drops different tokens than the single-device
    # reference and parity becomes meaningless (the unit tests use the
    # same convention — tests/test_moe_inference.py)
    moe = MoEConfig(num_experts=8, num_experts_per_tok=2,
                    capacity_factor=8.0)
    d, f, t = 256, 512, 64
    cfg = ModelConfig(vocab_size=64, hidden_dim=d, num_layers=1,
                      num_heads=2, num_kv_heads=2, intermediate_dim=f,
                      dtype="float32")
    params = init_moe_params(jax.random.PRNGKey(0), cfg, moe)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d), jnp.float32)
    ref, _ = moe_layer(x, params, moe)
    out = moe_layer_ep(mesh, x, params, moe)
    err = float(jnp.max(jnp.abs(out - ref)))
    # routed outputs are identical math modulo reduction order; the a2a
    # round-trip must not change results beyond epsilon
    rel = err / float(jnp.max(jnp.abs(ref)) + 1e-9)
    return {"mesh_devices": 8, "tokens": t, "experts": moe.num_experts,
            "max_abs_err_vs_single_device": err, "rel_err": rel,
            "parity": rel < 5e-5}


def predicted_v5e(B=64, seq=256):
    from physics_llm_inference_tpu.specs.ici import CollectiveCostModel
    from physics_llm_inference_tpu.specs.tpu import TPU_V5E

    m = CollectiveCostModel(spec=TPU_V5E)
    bw = TPU_V5E.hbm_bandwidth
    # serving-scale MoE of scripts/bench_moe.py: 16 layers, hidden 2048,
    # 8 experts top-2, expert FF 2816 — INT8 weights
    L, D, F, E, topk, HKV, HD = 16, 2048, 2816, 8, 2, 4, 128
    expert_bytes = L * E * 3 * D * F                       # int8
    nonexpert_bytes = int(0.85e9 - L * topk * 3 * D * F * 0)  # approx below
    # non-expert = total dense params (attention + embeddings + norms):
    # compute exactly like bench_moe does
    qo = (D // HD + 2 * HKV) * HD
    nonexpert_bytes = (L * (D * qo + (D // HD) * HD * D) + 2 * 32000 * D)
    kv_bytes_total = 2 * L * B * seq * HKV * HD            # int8 KV
    rows = []
    for ep in (1, 2, 4, 8, 16):
        # WEAK scaling — the serving configuration: every chip keeps a
        # full B-request decode batch (its own request stream), experts
        # shard E-ways... the expert stream each chip reads shrinks 1/ep
        # while its KV + non-expert stream stay per-chip constant
        cap = max(1, int(1.25 * B * topk / E))
        grid_bytes = E * cap * D * 2                       # bf16 dispatch grid
        hbm = (nonexpert_bytes + expert_bytes / ep + kv_bytes_total) / bw
        comm = 2 * L * m.all_to_all_time(grid_bytes, ep)
        step = hbm + comm
        tok_s_chip = B / step
        rows.append({
            "ep": ep, "step_ms": round(step * 1e3, 3),
            "hbm_ms": round(hbm * 1e3, 3),
            "a2a_ms": round(comm * 1e3, 3),
            "tok_s_per_chip": round(tok_s_chip, 0),
            "per_chip_speedup_vs_ep1": round(
                tok_s_chip * (nonexpert_bytes + expert_bytes
                              + kv_bytes_total) / bw / B, 2),
        })
    return rows


def main():
    out = {"metric": "ep_scaling"}
    out["executed_virtual_mesh"] = executed_virtual_mesh()
    out["predicted_v5e"] = predicted_v5e()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
