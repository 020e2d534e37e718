"""Execute the REFERENCE's own training loop end-to-end at reduced scale.

This runs `/root/reference/BS_brain.py::Agent.train` (the reference's actual
training loop, RL_Train_main.py:21-114 driver semantics) under the same
legacy-Keras shim stack as scripts/make_golden.py, and saves the returned
loss / reward curves for overlay against this repo's trainer
(scripts/overlay_reference_curves.py -> docs/PARITY.md).

Nothing of the reference's numerics is altered:
  * tf_keras is aliased to `keras` (the Keras 2 API the reference pins,
    README.md:8-11);
  * `tf.losses.huber_loss` -> `tf.compat.v1.losses.huber_loss` (identical
    formula, BS_brain.py:86-87);
  * `np.int` -> int (alias removed in numpy>=1.24; BS_brain.py:352,364);
  * optional --fast replaces the `model.predict` DISPATCH with a cached
    tf.function calling the same reference-built model object on the same
    inputs (BS_brain.py:225-231) — the computation graph and weights are
    the reference's own; only Keras' per-call predict-loop overhead is
    skipped.  model.fit (the weight update, BS_brain.py:218-223) is left
    untouched.

Run segments (each ~minutes-hours of CPU TF):
    python scripts/run_reference_training.py --episodes 300 --outdir results-refcurve
The reference's own every-5-episode Temp-Training-Result pickles
(BS_brain.py:853-907) land in --outdir and serve as crash protection; the
final curves are written to <outdir>/ref_train_curves.npz.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def install_shims():
    import tf_keras
    sys.modules["keras"] = tf_keras
    sys.modules["keras.layers"] = tf_keras.layers
    sys.modules["keras.models"] = tf_keras.models
    sys.modules["keras.backend"] = tf_keras.backend
    if not hasattr(tf_keras.layers, "activations"):
        tf_keras.layers.activations = tf_keras.activations
    import tensorflow as tf
    if not hasattr(tf.losses, "huber_loss"):
        tf.losses.huber_loss = tf.compat.v1.losses.huber_loss
    if not hasattr(np, "int"):
        np.int = int
    sys.path.insert(0, REFERENCE)


def patch_memory_sample_numpy_compat():
    """numpy>=1.24 raises on the ragged `np.array(self.samples)` in
    Memory.sample (BS_brain.py:262) that numpy 1.14 silently built as an
    object array. Re-implement the same two branches with an explicit
    object array — identical sampling semantics (uniform without
    replacement when full, with replacement otherwise, BS_brain.py:258-270)
    and identical np.random call sequence."""
    import BS_brain

    def sample(self, n):
        if len(self.samples) >= n:
            idx = np.random.choice(len(self.samples), n, replace=False)
            arr = np.empty(len(self.samples), dtype=object)
            for i, s in enumerate(self.samples):
                arr[i] = s
            return arr[idx]
        batch = []
        while len(batch) < n:
            index = np.random.randint(0, len(self.samples))
            batch.append(self.samples[index])
        return batch

    BS_brain.Memory.sample = sample


def patch_fast_predict():
    """Swap BS.predict's Keras predict-loop dispatch for a direct
    tf.function call of the SAME model (same graph, same weights,
    BS_brain.py:225-231). Numerics unchanged; removes ~40 ms/call of
    Keras predict machinery, which dominates the greedy-phase transition
    generation (one batch-1 predict per transition, BS_brain.py:336)."""
    import tensorflow as tf

    import BS_brain

    def predict(self, data_test, target=False):
        model = self.target_model if target else self.model
        fn = getattr(model, "_graft_call_fn", None)
        if fn is None:
            fn = tf.function(lambda inputs: model(inputs, training=False))
            model._graft_call_fn = fn
        outs = fn(data_test)
        return [o.numpy() for o in outs]

    BS_brain.BS.predict = predict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=300)
    ap.add_argument("--train-steps", type=int, default=20)
    ap.add_argument("--outdir", default="results-refcurve")
    ap.add_argument("--seed", type=int, default=1001)
    ap.add_argument("--fast", action="store_true", default=True)
    ap.add_argument("--no-fast", dest="fast", action="store_false")
    args = ap.parse_args()

    outdir = os.path.join(REPO, args.outdir)
    os.makedirs(outdir, exist_ok=True)
    # The reference joins checkpoint paths with '\\' onto os.getcwd()
    # (BS_brain.py:798) — run from outdir so its artifacts land there.
    os.chdir(outdir)

    install_shims()
    import random

    import tensorflow as tf

    import BS_brain
    import Environment
    from Sim_Config import RL_Config

    patch_memory_sample_numpy_compat()
    if args.fast:
        patch_fast_predict()

    # Seeds exactly as the reference train entry (RL_Train_main.py:44-47).
    random.seed(args.seed)
    np.random.seed(args.seed)
    tf.random.set_seed(args.seed)

    # Lane layout + env from RL_Train_main.start_env (RL_Train_main.py:78-92).
    up = [3.5 / 2, 3.5 / 2 + 3.5, 250 + 3.5 / 2, 250 + 3.5 + 3.5 / 2,
          500 + 3.5 / 2, 500 + 3.5 + 3.5 / 2]
    down = [250 - 3.5 - 3.5 / 2, 250 - 3.5 / 2, 500 - 3.5 - 3.5 / 2,
            500 - 3.5 / 2, 750 - 3.5 - 3.5 / 2, 750 - 3.5 / 2]
    left = [3.5 / 2, 3.5 / 2 + 3.5, 433 + 3.5 / 2, 433 + 3.5 + 3.5 / 2,
            866 + 3.5 / 2, 866 + 3.5 + 3.5 / 2]
    right = [433 - 3.5 - 3.5 / 2, 433 - 3.5 / 2, 866 - 3.5 - 3.5 / 2,
             866 - 3.5 / 2, 1299 - 3.5 - 3.5 / 2, 1299 - 3.5 / 2]
    env = Environment.Environ(down, up, left, right, 750, 1299)
    env.new_random_game(env.n_Veh)

    # Config values from the train entry (RL_Train_main.py:28-36, 59).
    cfg = RL_Config()
    cfg.set_train_value(16, 0.5, 512, 1, 0.1)

    agent = BS_brain.Agent(env.n_Veh, env.n_RB, env.n_Neighbor,
                           cfg.Num_Feedback, env, cfg)

    t0 = time.time()
    (train_loss, reward_per_train_step, reward_per_episode,
     q_mean, q_max_mean, orig_q_mean, orig_q_max_mean) = agent.train(
        args.episodes, args.train_steps)
    dt = time.time() - t0
    print(f"reference training: {args.episodes} episodes in {dt:.1f}s "
          f"({dt / args.episodes:.2f} s/episode)")

    np.savez_compressed(
        os.path.join(outdir, "ref_train_curves.npz"),
        train_loss=train_loss,
        reward_per_train_step=reward_per_train_step,
        reward_per_episode=reward_per_episode,
        q_mean=q_mean, q_max_mean=q_max_mean,
        orig_q_mean=orig_q_mean, orig_q_max_mean=orig_q_max_mean,
        episodes=np.int64(args.episodes),
        train_steps=np.int64(args.train_steps),
        seed=np.int64(args.seed),
        wall_seconds=np.float64(dt))
    print("saved ref_train_curves.npz")


if __name__ == "__main__":
    main()
