"""Entry harness: train/test/evaluate drivers (reference C26-C28)."""

from gnnra_tpu.harness.agent import Agent, enumerate_joint_actions  # noqa: F401
