"""Generate the golden numerics-parity bundle in tests/golden/.

Two bundles, both *independent* of this repo's JAX/NumPy transcriptions:

  golden_env.npz   — produced by EXECUTING the reference implementation
                     (/root/reference/Environment.py, pure NumPy) with fixed
                     seeds: channel matrices, reward-engine outputs
                     (compute_reward_with_channel_selection,
                     Environment.py:406-458) and interference observations
                     (Compute_Interference, Environment.py:460-493) for fixed
                     action sets.

  golden_model.npz — produced by TensorFlow/Keras (the reference's own
                     framework family): the 3-round GNN-DQN forward pass
                     (BS_brain.py:108-216) computed with tf ops + the
                     kron-lifted 64x64 adjacency (BS_brain.py:492-493,603),
                     per-layer activations, Bellman targets
                     (BS_brain.py:670-692), TF1-semantics Huber loss
                     (BS_brain.py:86-87: mean over all elements, heads
                     summed), and one keras.optimizers.Adam(lr=1e-3,
                     beta_1=0.5, beta_2=0.999) step (BS_brain.py:212-214)
                     via keras's own optimizer implementation.

tests/test_parity_golden.py asserts the JAX framework reproduces every
array in these bundles. Regenerate with:  python scripts/make_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
REFERENCE = "/root/reference"

N_VEH = 4
N_RB = 4
N_NEIGHBOR = 1
F = 16           # num_feedback
NODE_DIM = 9
EDGE_DIM = 4
HEAD_DIMS = (41, 80, 40, 20, 4)
GNN_ROUNDS = 3


# ---------------------------------------------------------------------------
# Part A: environment golden — run the reference simulator
# ---------------------------------------------------------------------------

def make_env_golden():
    sys.path.insert(0, REFERENCE)
    import random

    import Environment  # the reference module itself

    out = {}
    # Lane layout from the reference entry scripts (RL_Train_main.py:78-84).
    half = 3.5 / 2
    up = [half, half + 3.5, 250 + half, 250 + 3.5 + half, 500 + half,
          500 + 3.5 + half]
    down = [250 - 3.5 - half, 250 - half, 500 - 3.5 - half, 500 - half,
            750 - 3.5 - half, 750 - half]
    left = [half, half + 3.5, 433 + half, 433 + 3.5 + half, 866 + half,
            866 + 3.5 + half]
    right = [433 - 3.5 - half, 433 - half, 866 - 3.5 - half, 866 - half,
             1299 - 3.5 - half, 1299 - half]

    for g, seed in enumerate([1001, 7]):
        random.seed(seed)
        np.random.seed(seed)
        env = Environment.Environ(down, up, left, right, 750, 1299)
        env.new_random_game(N_VEH)

        p = f"g{g}_"
        out[p + "positions"] = np.asarray(
            [v.position for v in env.vehicles], np.float64)
        out[p + "velocities"] = np.asarray(
            [v.velocity for v in env.vehicles], np.float64)
        out[p + "destinations"] = np.asarray(
            [v.destinations for v in env.vehicles], np.int32)
        out[p + "pl_v2v"] = env.V2Vchannels.PathLoss
        out[p + "pl_v2i"] = env.V2Ichannels.PathLoss
        out[p + "v2v_abs"] = env.V2V_channels_abs
        out[p + "v2i_abs"] = env.V2I_channels_abs
        out[p + "v2v_fast"] = env.V2Vchannels.FastFading
        out[p + "v2i_fast"] = env.V2Ichannels.FastFading

        rng = np.random.RandomState(100 + g)
        action_sets = [
            np.zeros((N_VEH, N_NEIGHBOR), np.int64),              # all same RB
            np.arange(N_VEH)[:, None] % N_RB,                     # distinct RBs
            rng.randint(0, N_RB, (N_VEH, N_NEIGHBOR)),            # random
        ]
        activate_sets = [
            np.ones((N_VEH, N_NEIGHBOR), bool),
            np.ones((N_VEH, N_NEIGHBOR), bool),
            np.asarray([[True], [False], [True], [True]]),        # one inactive
        ]
        for a, (actions, act_links) in enumerate(
                zip(action_sets, activate_sets)):
            env.activate_links = act_links.copy()
            q = f"{p}a{a}_"
            out[q + "actions"] = actions.astype(np.int32)
            out[q + "activate_links"] = act_links
            # compute_reward mutates the passed array (actions[~active]=-1,
            # Environment.py:424) — pass a fresh copy like the callers do.
            v2v_rate, v2i_rate, interference = \
                env.compute_reward_with_channel_selection(actions.copy())
            out[q + "v2v_rate"] = v2v_rate
            out[q + "v2i_rate"] = v2i_rate
            out[q + "v2i_interference"] = interference
            env.Compute_Interference(actions.copy())
            out[q + "interference_obs_db"] = env.V2V_Interference_all

    np.savez_compressed(os.path.join(GOLDEN_DIR, "golden_env.npz"), **out)
    print(f"golden_env.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Part B: model golden — TF/Keras forward + Bellman + Huber + Adam step
# ---------------------------------------------------------------------------

def _init_weights(rng):
    """Per-node, per-round unshared weights (BS_brain.py:147-200 builds
    independent GNNLayer/Dense instances per D2D and per round)."""
    w = {}
    for r in range(GNN_ROUNDS):
        a_dim = NODE_DIM if r == 0 else F + NODE_DIM
        for i in range(N_VEH):
            s = 0.3
            w[f"w1_r{r}_n{i}"] = rng.normal(0, s, (a_dim, F)).astype(np.float32)
            w[f"w2_r{r}_n{i}"] = rng.normal(0, s, (EDGE_DIM, F)).astype(np.float32)
            w[f"w3_r{r}_n{i}"] = rng.normal(0, s, (F, F)).astype(np.float32)
            w[f"b_r{r}_n{i}"] = rng.normal(0, 0.1, (F,)).astype(np.float32)
    for li in range(len(HEAD_DIMS) - 1):
        for i in range(N_VEH):
            s = np.sqrt(2.0 / HEAD_DIMS[li])
            w[f"hw_l{li}_n{i}"] = rng.normal(
                0, s, (HEAD_DIMS[li], HEAD_DIMS[li + 1])).astype(np.float32)
            w[f"hb_l{li}_n{i}"] = rng.normal(
                0, 0.1, (HEAD_DIMS[li + 1],)).astype(np.float32)
    return w


def make_model_golden():
    import tensorflow as tf

    def forward(wvars, node, edge, adj64, collect=False):
        """node [B,N,9], edge [B,N,4], adj64 [B,4F,4F] kron-lifted.

        The reference computation graph (BS_brain.py:147-200): per-D2D
        GNNLayer relu(a@W1+e@W2+c@W3+b) (BS_brain.py:44-51), AggLayer
        concat -> batch_dot(D, A, axes=[1,1]) -> split (BS_brain.py:69-76),
        final round linear, head MLP 80/40/20 relu + linear output.
        """
        inter = {}
        hs = [tf.zeros_like(node[:, 0, :F]) for _ in range(N_VEH)]  # unused r0
        aggs = [tf.zeros((tf.shape(node)[0], F), tf.float32)
                for _ in range(N_VEH)]                # zero neighbor input
        for r in range(GNN_ROUNDS):
            new_hs = []
            for i in range(N_VEH):
                a_in = (node[:, i] if r == 0
                        else tf.concat([hs[i], node[:, i]], axis=-1))
                z = (tf.matmul(a_in, wvars[f"w1_r{r}_n{i}"])
                     + tf.matmul(edge[:, i], wvars[f"w2_r{r}_n{i}"])
                     + tf.matmul(aggs[i], wvars[f"w3_r{r}_n{i}"])
                     + wvars[f"b_r{r}_n{i}"])
                new_hs.append(tf.nn.relu(z) if r < GNN_ROUNDS - 1 else z)
            hs = new_hs
            d = tf.concat(hs, axis=-1)                       # [B, 4F]
            agg_flat = tf.einsum("bi,bij->bj", d, adj64)     # batch_dot axes=[1,1]
            aggs = [agg_flat[:, i * F:(i + 1) * F] for i in range(N_VEH)]
            if collect:
                inter[f"h_r{r}"] = tf.stack(hs, axis=1)
                inter[f"agg_r{r}"] = tf.stack(aggs, axis=1)
        qs = []
        for i in range(N_VEH):
            x = tf.concat([node[:, i], hs[i], aggs[i]], axis=-1)  # [B, 41]
            for li in range(len(HEAD_DIMS) - 1):
                x = tf.matmul(x, wvars[f"hw_l{li}_n{i}"]) + wvars[f"hb_l{li}_n{i}"]
                if li < len(HEAD_DIMS) - 2:
                    x = tf.nn.relu(x)
            qs.append(x)
        q = tf.stack(qs, axis=1)                              # [B, N, A]
        return (q, inter) if collect else q

    def kron_lift(adj):
        """BS_brain.py:492-493,603: A64 = kron(A, I_F) per batch element."""
        return np.stack([np.kron(a, np.eye(F, dtype=np.float32))
                         for a in adj])

    out = {}
    rng = np.random.RandomState(42)
    online_w = _init_weights(rng)
    target_w = _init_weights(np.random.RandomState(43))
    for k, v in online_w.items():
        out[k] = v
    for k, v in target_w.items():
        out["tgt_" + k] = v

    # --- activations on a small batch -------------------------------------
    B = 8
    node = rng.normal(0, 1, (B, N_VEH, NODE_DIM)).astype(np.float32)
    edge = rng.normal(0, 1, (B, N_VEH, EDGE_DIM)).astype(np.float32)
    adj = (1.0 - np.eye(N_VEH)) * np.ones((B, 1, 1))
    # knock out one random entry per batch element (destination rule,
    # BS_brain.py:441-445 zeroes A[i, j] when i is j's destination)
    for b in range(B):
        i, j = rng.randint(0, N_VEH, 2)
        if i != j:
            adj[b, i, j] = 0.0
    adj = adj.astype(np.float32)
    out["node"], out["edge"], out["adj"] = node, edge, adj

    q, inter = forward(online_w, node, edge, kron_lift(adj), collect=True)
    out["q"] = q.numpy()
    for k, v in inter.items():
        out[k] = v.numpy()

    # --- one replay-update step at reference batch size --------------------
    import keras

    Bt = 512
    t_node = rng.normal(0, 1, (Bt, N_VEH, NODE_DIM)).astype(np.float32)
    t_edge = rng.normal(0, 1, (Bt, N_VEH, EDGE_DIM)).astype(np.float32)
    t_adj = np.tile((1.0 - np.eye(N_VEH, dtype=np.float32)), (Bt, 1, 1))
    t_node_next = rng.normal(0, 1, (Bt, N_VEH, NODE_DIM)).astype(np.float32)
    t_edge_next = rng.normal(0, 1, (Bt, N_VEH, EDGE_DIM)).astype(np.float32)
    actions = rng.randint(0, N_RB, (Bt, N_VEH)).astype(np.int32)
    rewards = rng.normal(0.5, 0.3, (Bt,)).astype(np.float32)
    gamma = 0.5  # training gamma (RL_Train_main.py:30)
    out["t_node"], out["t_edge"], out["t_adj"] = t_node, t_edge, t_adj
    out["t_node_next"], out["t_edge_next"] = t_node_next, t_edge_next
    out["t_actions"], out["t_rewards"] = actions, rewards
    out["gamma"] = np.float32(gamma)

    adj64 = kron_lift(t_adj)
    q_s = forward(online_w, t_node, t_edge, adj64).numpy()
    # S' reuses S's adjacency (BS_brain.py:583).
    q_sp = forward(target_w, t_node_next, t_edge_next, adj64).numpy()
    out["t_q_s"], out["t_q_sp"] = q_s, q_sp

    # Bellman targets (BS_brain.py:670-692): y = Q(s); y[b,n,a_bn] =
    # r_b + gamma * max_a Q_target(s')[b,n,a] — global shared reward.
    y = q_s.copy()
    boot = rewards[:, None] + gamma * q_sp.max(axis=-1)       # [Bt, N]
    for n in range(N_VEH):
        y[np.arange(Bt), n, actions[:, n]] = boot[:, n]
    out["t_y"] = y

    wvars = {k: tf.Variable(v) for k, v in online_w.items()}
    with tf.GradientTape() as tape:
        q_pred = forward(wvars, tf.constant(t_node), tf.constant(t_edge),
                         tf.constant(adj64))
        # Keras compile-with-per-output-loss semantics: total loss is the
        # sum over the 4 heads of the per-head mean Huber (delta=1), which
        # equals the TF1 tf.losses.huber_loss mean (BS_brain.py:86-87,214).
        loss = tf.add_n([
            tf.reduce_mean(keras.losses.huber(y[:, n], q_pred[:, n],
                                              delta=1.0))
            for n in range(N_VEH)])
    grads = tape.gradient(loss, list(wvars.values()))
    out["t_loss"] = np.float32(loss.numpy())

    # keras Adam (same update rule in 2.2.4 and 3.x):
    # alpha = lr*sqrt(1-b2^t)/(1-b1^t); p -= alpha*m/(sqrt(v)+eps)
    opt = keras.optimizers.Adam(learning_rate=1e-3, beta_1=0.5,
                                beta_2=0.999, epsilon=1e-7)
    opt.apply_gradients(zip(grads, list(wvars.values())))
    for k, v in wvars.items():
        out["post_" + k] = v.numpy()

    np.savez_compressed(os.path.join(GOLDEN_DIR, "golden_model.npz"), **out)
    print(f"golden_model.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Part C: reference-executed model golden — run BS._create_model ITSELF
# ---------------------------------------------------------------------------

def _layer_name(kind, r=None, i=None, li=None):
    """Keras auto-naming of the reference graph (creation order,
    BS_brain.py:108-216): round-1 GNNs are named D{i}_GNN; rounds 2/3
    construct fresh GNNLayers inline -> gnn_layer, gnn_layer_1..7; the four
    head MLPs create dense..dense_11 interleaved per D2D."""
    if kind == "gnn":
        if r == 0:
            return f"D{i + 1}_GNN"
        idx = (r - 1) * 4 + i
        return "gnn_layer" if idx == 0 else f"gnn_layer_{idx}"
    if kind == "head":
        if li == 3:
            return f"D{i + 1}_Decide_Output"
        idx = 3 * i + li
        return "dense" if idx == 0 else f"dense_{idx}"
    raise ValueError(kind)


def make_refmodel_golden():
    """Execute the reference's `BS._create_model` (BS_brain.py:108-216)
    under legacy-Keras shims (tf_keras provides the Keras 2 API the
    reference pins; tf.losses.huber_loss patched to compat.v1) and record
    its weights, per-layer activations, and Q outputs. This closes the last
    transcription gap: golden_model.npz re-builds the graph by hand in TF,
    so a wiring misreading there would be invisible; this bundle is the
    reference graph run by the reference's own code."""
    import sys as _sys

    import tf_keras
    _sys.modules["keras"] = tf_keras
    _sys.modules["keras.layers"] = tf_keras.layers
    _sys.modules["keras.models"] = tf_keras.models
    _sys.modules["keras.backend"] = tf_keras.backend
    if not hasattr(tf_keras.layers, "activations"):
        # importable as a `keras.layers` attribute in Keras 2.2.4
        tf_keras.layers.activations = tf_keras.activations
    import tensorflow as tf
    if not hasattr(tf.losses, "huber_loss"):
        tf.losses.huber_loss = tf.compat.v1.losses.huber_loss

    _sys.path.insert(0, REFERENCE)
    import BS_brain  # the reference module itself

    tf.random.set_seed(77)
    brain = BS_brain.BS(N_VEH, 3, 1, F, 1, N_RB)  # Agent.__init__ args,
    model = brain.model                           # BS_brain.py:295-298

    out = {}
    layers = {layer.name: layer for layer in model.layers}
    # record weights under this repo's naming (round/node stacks)
    for r in range(GNN_ROUNDS):
        for i in range(N_VEH):
            w1, w2, w3, b = layers[_layer_name("gnn", r=r, i=i)].get_weights()
            out[f"w1_r{r}_n{i}"] = w1
            out[f"w2_r{r}_n{i}"] = w2
            out[f"w3_r{r}_n{i}"] = w3
            out[f"b_r{r}_n{i}"] = b
    for li in range(4):
        for i in range(N_VEH):
            k, b = layers[_layer_name("head", i=i, li=li)].get_weights()
            out[f"hw_l{li}_n{i}"] = k
            out[f"hb_l{li}_n{i}"] = b

    # inputs: batch of random observations; neighbor inputs are zeros as in
    # the reference runtime (BS_brain.py:478); kron-lifted adjacency
    rng = np.random.RandomState(123)
    B = 8
    node = rng.normal(0, 1, (B, N_VEH, NODE_DIM)).astype(np.float32)
    edge = rng.normal(0, 1, (B, N_VEH, EDGE_DIM)).astype(np.float32)
    adj = (1.0 - np.eye(N_VEH)) * np.ones((B, 1, 1))
    for b in range(B):
        i, j = rng.randint(0, N_VEH, 2)
        if i != j:
            adj[b, i, j] = 0.0
    adj = adj.astype(np.float32)
    adj64 = np.stack([np.kron(a, np.eye(F, dtype=np.float32)) for a in adj])
    out["node"], out["edge"], out["adj"] = node, edge, adj

    feed = []
    for i in range(N_VEH):
        feed += [node[:, i], edge[:, i], np.zeros((B, F), np.float32)]
    feed.append(adj64)

    # per-layer activations straight from the reference graph: every
    # GNNLayer's output, plus the (shared) Aggregate layer's output at each
    # of its three call sites
    probes = []
    probe_names = []
    for r in range(GNN_ROUNDS):
        for i in range(N_VEH):
            probes.append(layers[_layer_name("gnn", r=r, i=i)].output)
            probe_names.append(f"h_r{r}_n{i}")
    agg = layers["Aggregate"]
    for call in range(GNN_ROUNDS):
        outs = agg.get_output_at(call)
        for i in range(N_VEH):
            probes.append(outs[i])
            probe_names.append(f"agg_r{call}_n{i}")
    probe_model = tf_keras.models.Model(inputs=model.inputs, outputs=probes)
    acts = probe_model.predict(feed, verbose=0)
    for name, act in zip(probe_names, acts):
        out["ref_" + name] = act

    qs = model.predict(feed, verbose=0)
    out["q"] = np.stack(qs, axis=1)        # [B, N, A]

    np.savez_compressed(os.path.join(GOLDEN_DIR, "golden_refmodel.npz"),
                        **out)
    print(f"golden_refmodel.npz: {len(out)} arrays")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    make_env_golden()
    make_model_golden()
    make_refmodel_golden()
