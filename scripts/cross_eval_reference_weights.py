"""Cross-evaluate the EXECUTED reference's learned weights under this
repo's environment (round-5 overlay diagnosis).

The curve overlay (scripts/overlay_reference_curves.py) found both
executed-reference runs plateauing ~14% above the repo's 8-seed band.
Two hypotheses: (a) the reference's TRAINING dynamics find a better
policy, or (b) the two environments' return distributions differ for
equally-good policies. Discriminate by loading the reference's trained
.h5 weights (extracted into a w*_r{r}_n{i} npz by the shim stack — see
the extraction snippet in docs/PARITY.md) into THIS repo's model and
greedily evaluating both weight sets on IDENTICAL repo test episodes:

  * ref weights >> repo weights under the repo env  -> (a) learning gap
  * ref weights ~= repo weights under the repo env  -> (b) env-return
    scale difference (and the overlay gap is not a learning deficit)

Usage:
  python scripts/cross_eval_reference_weights.py \
      --ref-npz /tmp/ref_w_s7.npz \
      --repo-ckpt results-overlay/seed42/.../checkpoint-episode-500.npz \
      [--episodes 300] [--steps 100]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def params_from_ref_npz(g, n=4, rounds=3, head_layers=4):
    import jax.numpy as jnp
    params = {"gnn": [], "head": []}
    for r in range(rounds):
        params["gnn"].append({
            k: jnp.stack([jnp.asarray(g[f"{k}_r{r}_n{i}"])
                          for i in range(n)])
            for k in ("w1", "w2", "w3", "b")})
    for li in range(head_layers):
        params["head"].append({
            "w": jnp.stack([jnp.asarray(g[f"hw_l{li}_n{i}"])
                            for i in range(n)]),
            "b": jnp.stack([jnp.asarray(g[f"hb_l{li}_n{i}"])
                            for i in range(n)])})
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-npz", default="/tmp/ref_w_s7.npz")
    ap.add_argument("--repo-ckpt", default=None,
                    help="glob; default: any results-overlay seed's "
                    "checkpoint-episode-500.npz")
    ap.add_argument("--episodes", type=int, default=300)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--eval-seed", type=int, default=555)
    args = ap.parse_args()

    from gnnra_tpu.harness.train_main import build_agent
    from gnnra_tpu.utils import checkpoint as ckpt

    def fresh_agent():
        return build_agent("parity", seed=args.eval_seed,
                           results_base="/tmp/cross-eval")

    results = {}

    # --- reference weights under the repo env
    agent = fresh_agent()
    ref_params = params_from_ref_npz(np.load(args.ref_npz))
    agent.state = agent.state.replace(params=ref_params)
    res = agent.test_run(args.episodes, args.steps, opt_flag=False)
    results["ref_weights"] = float(res["expect_return"].mean())
    results["ra"] = float(res["ra_expect_return"].mean())

    # --- repo-trained weights, same eval seed (identical episodes)
    pat = args.repo_ckpt or os.path.join(
        REPO, "results-overlay", "seed*", "*", "checkpoint-episode-500.npz")
    paths = sorted(glob.glob(pat))
    assert paths, f"no repo checkpoint matches {pat}"
    for path in paths:
        agent2 = fresh_agent()
        params, target, _, _ = ckpt.load(path, agent2.state.params,
                                         agent2.state.target_params)
        agent2.state = agent2.state.replace(params=params,
                                            target_params=target)
        res2 = agent2.test_run(args.episodes, args.steps, opt_flag=False)
        seed_tag = path.split("results-overlay/")[-1].split("/")[0]
        results[f"repo_weights_{seed_tag}"] = float(
            res2["expect_return"].mean())

    print(json.dumps(results, indent=1))
    repo_scores = [v for k, v in results.items()
                   if k.startswith("repo_weights")]
    print(f"ref {results['ref_weights']:.2f} vs repo "
          f"mean {np.mean(repo_scores):.2f} "
          f"(range {min(repo_scores):.2f}..{max(repo_scores):.2f}), "
          f"RA {results['ra']:.2f}")


if __name__ == "__main__":
    main()
