"""RL runtime: replay memory, policies, jitted DQN trainer, harness agent."""

from gnnra_tpu.agent import dqn, policy, replay  # noqa: F401
from gnnra_tpu.agent.dqn import (  # noqa: F401
    AgentState,
    init_agent,
    replay_update,
    rollout,
    train_step,
)
