"""Checkpoint save/load for parameter pytrees.

Replaces the reference's Keras `.h5` weight files with hyperparameter-encoded
names (reference BS_brain.py:853-869, loaded by filename reconstruction at
BS_brain.py:1233-1256, RL_Run_main.py:124-145). We keep the same
filename-encodes-config convention (so the checkpoint evaluator can walk the
training history) but store flattened-pytree .npz archives, and both networks
plus optimizer state in one file so training can resume exactly — the
reference saves only model weights (no optimizer/replay state; SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from gnnra_tpu.config import TrainConfig


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template: Any, flat: Dict[str, np.ndarray], prefix: str) -> Any:
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_with_paths:
        key = prefix + jax.tree_util.keystr(path)
        arr = flat[key]
        want = np.asarray(leaf)
        if arr.shape != want.shape:
            # Fail at load time with a useful message instead of at the first
            # post-load trace (e.g. a pre-refactor checkpoint whose replay
            # ring was stored [C, N, D] loading into the 2-D [C, flat]
            # template would otherwise slip through silently).
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, but the "
                f"template expects {want.shape} — stale checkpoint layout?")
        leaves.append(np.asarray(arr, dtype=want.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def result_dir(base: str, cfg: TrainConfig) -> str:
    """Hyperparameter-encoded results directory, analogous to the reference's
    'Train-Result-RealFB-16-Batch-512-Gamma-0.5-V2Iweight-0.1'
    (BS_brain.py:794-798), with portable path joining."""
    name = (f"train-result-fb16-batch-{cfg.batch_size}"
            f"-gamma-{cfg.gamma}-v2iweight-{cfg.v2i_weight}")
    return os.path.join(base, name)


def checkpoint_path(directory: str, episode: int) -> str:
    """Episode-encoded checkpoint filename (reference BS_brain.py:859-861)."""
    return os.path.join(directory, f"checkpoint-episode-{episode}.npz")


def save(path: str, params: Any, target_params: Any,
         opt_state: Optional[Any] = None, **scalars) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    flat.update(_flatten(params, "params"))
    flat.update(_flatten(target_params, "target"))
    if opt_state is not None:
        flat.update(_flatten(opt_state, "opt"))
    for k, v in scalars.items():
        flat["scalar:" + k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)           # atomic: no torn checkpoints on crash


class _SaveWorker:
    """Thread wrapper whose join() re-raises the worker's exception —
    Thread.join() alone swallows failures (e.g. disk full), letting a
    trainer report success with missing checkpoints."""

    def __init__(self, fn, args, kwargs):
        import threading

        self._exc: Optional[BaseException] = None

        def run():
            try:
                fn(*args, **kwargs)
            except BaseException as e:      # noqa: BLE001 — re-raised on join
                self._exc = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def join(self, timeout: Optional[float] = None) -> None:
        self._thread.join(timeout)
        if self._exc is not None:
            raise self._exc


def save_async(path: str, params: Any, target_params: Any,
               opt_state: Optional[Any] = None, **scalars) -> _SaveWorker:
    """Asynchronous checkpoint: device->host pulls happen eagerly (so the
    training step can donate/overwrite device buffers), serialization runs
    on a worker thread. Returns a worker; join() re-raises worker errors."""
    host_params = jax.device_get(params)
    host_target = jax.device_get(target_params)
    host_opt = jax.device_get(opt_state) if opt_state is not None else None
    return _SaveWorker(save, (path, host_params, host_target, host_opt),
                       scalars)


def save_state(path: str, state: Any, **scalars) -> None:
    """Atomically save an arbitrary pytree (e.g. a full AgentState including
    the replay ring) — the exact-resume companion to `save`, which keeps the
    small per-episode checkpoints free of the multi-MB replay buffers.

    Uncompressed on purpose: the dominant payload is the replay ring's
    float data, which zlib barely shrinks but costs seconds per save at
    100 MB — full-state saves sit on the training path (resume cadence),
    so write speed wins over size here (the small per-episode checkpoints
    stay compressed in `save`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state, "state")
    for k, v in scalars.items():
        flat["scalar:" + k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_state(path: str, template: Any) -> Tuple[Any, Dict[str, np.ndarray]]:
    """Restore a pytree saved by `save_state`. Returns (state, scalars)."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    state = _unflatten(template, flat, "state")
    scalars = {k[len("scalar:"):]: flat[k] for k in flat
               if k.startswith("scalar:")}
    return state, scalars


def load(path: str, params_template: Any, target_template: Any,
         opt_template: Optional[Any] = None
         ) -> Tuple[Any, Any, Optional[Any], Dict[str, np.ndarray]]:
    """Restore (params, target_params, opt_state, scalars)."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    params = _unflatten(params_template, flat, "params")
    target = _unflatten(target_template, flat, "target")
    opt = None
    if opt_template is not None and any(k.startswith("opt") for k in flat):
        opt = _unflatten(opt_template, flat, "opt")
    scalars = {k[len("scalar:"):]: flat[k] for k in flat
               if k.startswith("scalar:")}
    return params, target, opt, scalars
