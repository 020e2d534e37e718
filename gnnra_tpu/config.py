"""Typed configuration for the TPU-native GNN-DQN resource-allocation framework.

The reference keeps configuration in a mutable attribute bag (`RL_Config`,
reference Sim_Config.py:6-51) plus constants hard-coded in each entry script
(reference RL_Train_main.py:26-38, BS_brain.py:274-277, Environment.py:182-212).
Here everything is an immutable dataclass so configs can be closed over by
jitted functions (static hashable pytrees) and named presets cover the five
BASELINE.json benchmark configs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _manhattan_lanes() -> Tuple[Tuple[float, ...], ...]:
    """Manhattan-grid lane coordinates (reference RL_Train_main.py:78-84)."""
    half = 3.5 / 2
    up = (half, half + 3.5, 250 + half, 250 + 3.5 + half, 500 + half, 500 + 3.5 + half)
    down = (250 - 3.5 - half, 250 - half, 500 - 3.5 - half, 500 - half,
            750 - 3.5 - half, 750 - half)
    left = (half, half + 3.5, 433 + half, 433 + 3.5 + half, 866 + half, 866 + 3.5 + half)
    right = (433 - 3.5 - half, 433 - half, 866 - 3.5 - half, 866 - half,
             1299 - 3.5 - half, 1299 - half)
    return up, down, left, right


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Vehicular V2X channel/mobility simulator parameters.

    Mirrors the constants of `Environ.__init__` (reference Environment.py:182-212)
    and the channel models (Environment.py:45-165); all fields are static so an
    `EnvConfig` can be a jit-static argument.
    """

    n_veh: int = 4                 # number of V2V pairs (nodes)
    n_rb: int = 4                  # number of resource blocks (channels)
    n_neighbor: int = 1            # receivers per transmitter
    width: float = 750.0
    height: float = 1299.0
    up_lanes: Tuple[float, ...] = _manhattan_lanes()[0]
    down_lanes: Tuple[float, ...] = _manhattan_lanes()[1]
    left_lanes: Tuple[float, ...] = _manhattan_lanes()[2]
    right_lanes: Tuple[float, ...] = _manhattan_lanes()[3]
    timestep: float = 0.01         # mobility integration step [s]
    # Radio parameters (Environment.py:192-201).
    v2v_power_dbm: float = 23.0
    v2i_power_dbm: float = 23.0
    v2v_power_levels_dbm: Tuple[float, ...] = (23.0, 10.0, 5.0)
    fixed_v2v_power_index: int = 1
    sig2_dbm: float = -114.0       # noise power
    bs_ant_gain: float = 8.0
    bs_noise_figure: float = 5.0
    veh_ant_gain: float = 3.0
    veh_noise_figure: float = 9.0
    # V2V channel model (WINNER+ B1; Environment.py:45-58).
    v2v_fc_ghz: float = 2.0
    v2v_h_bs: float = 1.5
    v2v_h_ms: float = 1.5
    v2v_decorrelation_distance: float = 10.0
    v2v_shadow_std: float = 3.0
    # V2I channel model (Environment.py:123-135).
    v2i_h_bs: float = 25.0
    v2i_h_ms: float = 1.5
    v2i_decorrelation_distance: float = 50.0
    v2i_shadow_std: float = 8.0
    bs_position: Tuple[float, float] = (750.0 / 2, 1299.0 / 2)
    # Shadowing advance distance factor used by renew_channel
    # (delta = 0.002 * velocity; Environment.py:387).
    shadow_delta_factor: float = 0.002
    turn_probability: float = 0.4  # Manhattan-grid turn chance (Environment.py:251)
    # Reproduce reference behavior quirks exactly (SURVEY.md "Hard parts"):
    #  - left-moving vehicles advance len(down_lanes)x per step
    #    (loop-nesting bug, Environment.py:316-324)
    #  - dead V2V term in Compute_Interference (Environment.py:486-487)
    faithful_quirks: bool = True

    @property
    def sig2(self) -> float:
        return 10.0 ** (self.sig2_dbm / 10.0)

    @property
    def n_links(self) -> int:
        return self.n_veh * self.n_neighbor


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """GNN-DQN architecture (reference BS_brain.py:90-216).

    Derived sizes follow BS.__init__ (BS_brain.py:94-104):
      node_dim  = ((input_node_info-1)*n_rb + 1)*n_neighbor  -> 9 for parity
      edge_dim  = input_edge_info*n_rb                       -> 4
    """

    n_nodes: int = 4               # V2V pairs == GNN nodes
    n_rb: int = 4                  # actions per node (Q-head width)
    n_neighbor: int = 1
    input_node_info: int = 3       # raw per-node feature groups (BS_brain.py:294)
    input_edge_info: int = 1
    num_feedback: int = 16         # per-node hidden/message width F
    gnn_rounds: int = 3            # message-passing rounds (BS_brain.py:147-166)
    head_hidden: Tuple[int, ...] = (80, 40, 20)   # decision MLP (BS_brain.py:176-178)
    share_weights: bool = False    # reference keeps per-node, per-round unshared
                                   # weights despite its comments (BS_brain.py:120,154-164)
    dtype: str = "float32"         # parameter/activation dtype ("bfloat16" for scale)

    @property
    def node_dim(self) -> int:
        return ((self.input_node_info - 1) * self.n_rb + 1) * self.n_neighbor

    @property
    def edge_dim(self) -> int:
        return self.input_edge_info * self.n_rb

    @property
    def d2d_input_dim(self) -> int:
        return self.node_dim + self.edge_dim

    @property
    def n_actions(self) -> int:
        return self.n_rb * self.n_neighbor


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """DQN training hyperparameters.

    Defaults reproduce the reference training entry (RL_Train_main.py:28-36,59,
    BS_brain.py:274-277,315-324,758,791; Sim_Config.py:10-23).
    """

    num_episodes: int = 10000
    num_train_steps: int = 20          # replay steps per episode
    transitions_per_step: int = 50     # env transitions before each replay (BS_brain.py:758)
    batch_size: int = 512
    gamma: float = 0.5
    learning_rate: float = 1e-3
    adam_beta1: float = 0.5            # Keras Adam(lr=0.001, beta_1=0.5) (BS_brain.py:212)
    adam_beta2: float = 0.999
    adam_eps: float = 1e-7             # Keras 2.2.4 default epsilon
    # 'keras_adam' reproduces keras's exact update rule (eps on the raw
    # sqrt(v), bias correction folded into alpha — see ops/optim.py);
    # 'adam' is plain optax.adam. Default faithful to the reference.
    optimizer: str = "keras_adam"
    memory_capacity: int = 1_000_000   # BS_brain.py:274
    target_update_every_env_steps: int = 500   # BS_brain.py:275
    max_epsilon: float = 1.0
    min_epsilon: float = 0.01
    epsilon_anneal_fraction: float = 0.8       # BS_brain.py:316
    v2v_weight: float = 1.0
    v2i_weight: float = 0.1
    v2v_rate_max: float = 1.0          # reward normalizer (BS_brain.py:428)
    save_model_interval: int = 5       # checkpoint every 5 episodes (BS_brain.py:791)
    # Episodes per device dispatch. Checkpoint cadence stays
    # save_model_interval: in-chunk weight snapshots are emitted by
    # dqn.train_episodes_snapshots, so the chunk is bounded by host memory,
    # not by the checkpoint interval. On a tunnel-attached runtime each
    # dispatch + result pull costs ~2-30 ms regardless of payload (round-4
    # measurement: one device_get RTT ~27 ms in-session), so the chunk
    # amortizes the host sync; 200 episodes keeps the pull under ~15% of
    # wall time while checkpoint snapshots still land every 5 episodes.
    # Compile time is chunk-independent (the program scans over groups).
    episode_chunk: int = 200
    num_envs: int = 1                  # parallel vectorized environments (vmap axis)
    # Replay sampling: 'fast' draws uniform indices with replacement (device
    # friendly); 'faithful' samples without replacement like np.random.choice
    # (BS_brain.py:261).
    replay_sampling: str = "fast"
    # Scan-free rollout (dqn.rollout_parallel): in the reference's MDP the
    # NEXT STATE never depends on the action — mobility/channels are
    # action-independent, and with every link active the interference
    # observation's only action-dependent branch is the dead code at
    # Environment.py:486 — so all T forwards/featurizations/rewards of a
    # burst batch into one computation, reproducing the sequential
    # trajectory exactly (tests/test_agent.py pins equality). Valid while
    # activate_links stays all-True, which training always satisfies
    # (nothing in the reference deactivates links). Set False to force the
    # sequential scan (required if links can deactivate mid-burst).
    parallel_rollout: bool = True
    seed: int = 1001                   # RL_Train_main.py:44-47


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Test/evaluation harness settings (RL_Run_main.py:37-39,78;
    RL_Evaluated_main_Epsilon_DiffTrails.py:36-42)."""

    num_episodes: int = 2000
    num_test_steps: int = 100
    opt_flag: bool = False             # brute-force optimal baseline
    fixed_epsilon: float = 0.0
    num_trials: int = 10
    evaluation_episode_interval: int = 5
    seed: int = 1


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Bundles everything a training/eval run needs."""

    env: EnvConfig = EnvConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()
    name: str = "parity"


# ---------------------------------------------------------------------------
# Named presets — the five BASELINE.json benchmark configs.
# ---------------------------------------------------------------------------

def parity_config() -> RunConfig:
    """Config 1: paper baseline — 4 V2V pairs + 4 V2I links (parity with ref)."""
    return RunConfig(name="parity")


def scaled_config() -> RunConfig:
    """Config 2: 20 V2V pairs / 20 V2I links, deeper 4-round interference GNN."""
    env = EnvConfig(n_veh=20, n_rb=20)
    model = ModelConfig(n_nodes=20, n_rb=20, gnn_rounds=4, dtype="bfloat16")
    train = TrainConfig(memory_capacity=200_000)
    return RunConfig(env=env, model=model, train=train, name="scaled")


def batched_config(num_envs: int = 256) -> RunConfig:
    """Config 3: 256 parallel environment graphs, vectorized channel sim.

    Replay capacity is rounded up to a multiple of the burst size
    (transitions_per_step * num_envs) so `replay.add_batch` keeps its
    cursor burst-aligned and emits the conditional-free
    dynamic-update-slice append (see replay.add_batch)."""
    burst = TrainConfig().transitions_per_step * num_envs
    capacity = -(-200_000 // burst) * burst
    train = TrainConfig(num_envs=num_envs, memory_capacity=capacity)
    return RunConfig(train=train, name="batched")


@dataclasses.dataclass(frozen=True)
class SyntheticGraphConfig:
    """Configs 4/5: synthetic interference graphs for SpMM/SDDMM benchmarks.

    topology 'geometric' (default) is the scaled analog of the reference's
    distance-threshold interference graph (Environment.py:360-376,
    `graph.geometric_interference_graph`) — the locality that BFS
    reordering + the windowed-dense kernel exploit (docs/RESULTS.md
    geometric table; `gnn_dqn_sparse.default_aggregate` picks the kernel).
    'random' is the locality-free stress topology the gather-based
    kernels are rooflined on.
    """

    num_nodes: int = 100_000
    num_edges: int = 1_000_000         # target; geometric lands near it
    feature_dim: int = 128
    seed: int = 0
    topology: str = "geometric"
    # Multi-host edge partitioning (config 5).
    num_partitions: int = 1

    def build_graph(self):
        """Materialize the COO graph (host-side preprocessing)."""
        from gnnra_tpu import graph as graph_lib
        if self.topology == "geometric":
            _, g = graph_lib.geometric_interference_graph(
                self.seed, self.num_nodes,
                target_degree=self.num_edges / self.num_nodes)
            return g
        return graph_lib.random_graph_host(self.seed, self.num_nodes,
                                           self.num_edges)


def synthetic_graph_config() -> SyntheticGraphConfig:
    return SyntheticGraphConfig()


def multihost_graph_config(num_partitions: int = 4) -> SyntheticGraphConfig:
    return SyntheticGraphConfig(num_nodes=1_000_000, num_edges=10_000_000,
                                num_partitions=num_partitions)


PRESETS = {
    "parity": parity_config,
    "scaled": scaled_config,
    "batched": batched_config,
}
