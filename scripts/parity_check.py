"""Numerics-parity harness (SURVEY.md 'Hard parts').

Loads (or generates) a fixed set of weights + inputs, runs the JAX model
forward, and checks every per-round activation and the final Q-values
against a literal NumPy transcription of the reference graph semantics
(GNNLayer math BS_brain.py:44-51, kron-lifted AggLayer BS_brain.py:69-76,
decision MLPs BS_brain.py:173-200). Prints max abs error per layer.

Usage: python scripts/parity_check.py [--dump out.npz]
With --dump, saves weights/inputs/activations so the same check can be
replayed against any other implementation (e.g. the TF1 reference in its
own environment).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def np_gnn_layer(a, b, c, w1, w2, w3, bias, relu=True):
    out = a @ w1 + b @ w2 + c @ w3 + bias
    return np.maximum(out, 0) if relu else out


def np_agg_kron(feats, adj, f):
    bsz, n, _ = feats.shape
    d = feats.reshape(bsz, n * f)
    a_block = np.stack([np.kron(a, np.eye(f)) for a in adj])
    return np.einsum("bi,bij->bj", d, a_block).reshape(bsz, n, f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dump", default=None)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    # Exact f32 matmul accumulation: on TPU the DEFAULT precision runs
    # matmuls through bf16 passes (~1e-2 abs error on this model), which is
    # the intended fast path for training but not for a numerics audit.
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from gnnra_tpu.config import ModelConfig
    from gnnra_tpu.models import gnn_dqn

    cfg = ModelConfig()
    params = gnn_dqn.init_params(jax.random.PRNGKey(42), cfg)
    rng = np.random.RandomState(0)
    node = rng.randn(args.batch, cfg.n_nodes, cfg.node_dim).astype(np.float32)
    edge = rng.randn(args.batch, cfg.n_nodes, cfg.edge_dim).astype(np.float32)
    adj = (np.ones((cfg.n_nodes,) * 2) - np.eye(cfg.n_nodes)).astype(
        np.float32)
    adj_b = np.broadcast_to(adj, (args.batch,) + adj.shape)

    q, inter = gnn_dqn.apply_with_intermediates(
        params, jnp.asarray(node), jnp.asarray(edge), jnp.asarray(adj), cfg)

    # NumPy oracle, reference-graph style
    f = cfg.num_feedback
    nbr = np.zeros((args.batch, cfg.n_nodes, f), np.float32)
    h = None
    ok = True
    for r in range(cfg.gnn_rounds):
        p = jax.tree.map(np.asarray, params["gnn"][r])
        a_in = node if r == 0 else np.concatenate([h, node], axis=-1)
        relu = r < cfg.gnn_rounds - 1
        h = np.stack([np_gnn_layer(a_in[:, i], edge[:, i], nbr[:, i],
                                   p["w1"][i], p["w2"][i], p["w3"][i],
                                   p["b"][i], relu)
                      for i in range(cfg.n_nodes)], axis=1)
        nbr = np_agg_kron(h, adj_b, f)
        err_h = np.abs(np.asarray(inter["h"][r]) - h).max()
        err_a = np.abs(np.asarray(inter["agg"][r]) - nbr).max()
        print(f"round {r}: combine max|err| = {err_h:.2e}   "
              f"aggregate max|err| = {err_a:.2e}")
        ok &= err_h < 1e-3 and err_a < 1e-3

    x = np.concatenate([node, h, nbr], axis=-1)
    for li, layer in enumerate(params["head"]):
        p = jax.tree.map(np.asarray, layer)
        x = np.stack([x[:, i] @ p["w"][i] + p["b"][i]
                      for i in range(cfg.n_nodes)], axis=1)
        if li < len(params["head"]) - 1:
            x = np.maximum(x, 0)
    err_q = np.abs(np.asarray(q) - x).max()
    print(f"Q-head: max|err| = {err_q:.2e}")
    ok &= err_q < 1e-3

    if args.dump:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            flat["param" + jax.tree_util.keystr(path)] = np.asarray(leaf)
        np.savez_compressed(args.dump, node=node, edge=edge, adj=adj,
                            q=np.asarray(q), **flat)
        print(f"dumped parity bundle to {args.dump}")

    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
