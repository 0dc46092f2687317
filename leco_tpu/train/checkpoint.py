"""Full train-state checkpoint/resume (orbax).

The reference saves LoRA weights only and cannot resume — optimizer state,
LR position and the iteration counter are lost on crash
(SURVEY.md section 5.4; train_lora.py:292-302). This module adds what it
lacked: a periodic full-state snapshot (lora params, optimizer state,
iteration, PRNG key, host RNG state) and a restore path.

Export-format compatibility is untouched: the .safetensors LoRA files are
still written by leco_tpu.lora.save_lora_weights; this state lives in a
separate `<save.path>/state/` directory.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(
    directory: str | os.PathLike,
    *,
    lora,
    opt_state,
    iteration: int,
    key,
    rng: np.random.Generator,
    ema=None,
) -> str:
    """Snapshot everything needed to resume mid-run. `ema` (optional) is
    the EMA LoRA tree when train.ema_decay > 0; its presence is recorded in
    the rng sidecar so restore knows whether to ask orbax for it."""
    import orbax.checkpoint as ocp

    import json

    directory = os.fspath(directory)
    path = os.path.join(os.path.abspath(directory), f"step_{iteration}")
    state = {
        "lora": lora,
        "opt_state": opt_state,
        "iteration": np.asarray(iteration),
        "key": np.asarray(key),
    }
    if ema is not None:
        state["ema"] = ema
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    # host RNG state: JSON sidecar (PCG64 state holds 128-bit ints that do
    # not fit fixed-width array dtypes). "has_ema" rides along; old sidecars
    # without it read as False.
    sidecar = dict(rng.bit_generator.state)
    sidecar["has_ema"] = ema is not None
    with open(path + ".rng.json", "w") as f:
        json.dump(sidecar, f)
    gc_snapshots(directory, protect=iteration)
    return path


def gc_snapshots(
    directory: str | os.PathLike,
    keep_last: Optional[int] = None,
    protect: Optional[int] = None,
):
    """Delete all but the newest `keep_last` step_* snapshots (default 3,
    LECO_KEEP_SNAPSHOTS overrides; 0 disables GC). Long runs otherwise
    accumulate one full optimizer-state copy per save interval.

    `protect` names a step that is never deleted — save_train_state passes
    the step it just wrote, so restarting a run with a reset iteration
    counter into a directory holding older higher-numbered snapshots cannot
    GC the snapshot that was just written."""
    import shutil

    if keep_last is None:
        keep_last = int(os.environ.get("LECO_KEEP_SNAPSHOTS", "3"))
    if keep_last <= 0:
        return
    directory = os.path.abspath(os.fspath(directory))
    if not os.path.isdir(directory):
        return
    steps = sorted(
        s for s in (
            int(n.split("_", 1)[1])
            for n in os.listdir(directory)
            if n.startswith("step_") and not n.endswith(".json")
            and n.split("_", 1)[1].isdigit()
        )
    )
    for s in steps[:-keep_last]:
        if protect is not None and s == protect:
            continue
        path = os.path.join(directory, f"step_{s}")
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.remove(path + ".rng.json")
        except OSError:
            pass


def latest_step(directory: str | os.PathLike) -> Optional[int]:
    directory = os.fspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_train_state(
    directory: str | os.PathLike,
    iteration: Optional[int] = None,
    like: Optional[dict] = None,
) -> Optional[dict]:
    """Restore the latest (or a specific) snapshot; None if absent.

    `like` = {"lora": ..., "opt_state": ...} structure templates — needed to
    rebuild optax NamedTuple states, which orbax would otherwise return as
    plain dicts."""
    directory = os.fspath(directory)
    step = iteration if iteration is not None else latest_step(directory)
    if step is None:
        return None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = _checkpointer()
    import json

    with open(path + ".rng.json") as f:
        sidecar = json.load(f)
    has_ema = sidecar.pop("has_ema", False)

    item = None
    if like is not None:
        item = {
            "lora": like["lora"],
            "opt_state": like["opt_state"],
            "iteration": np.asarray(0),
            "key": np.zeros(2, dtype=np.uint32),
        }
        if has_ema:
            item["ema"] = like["lora"]
    state = ckptr.restore(path, item=item)
    state["iteration"] = int(np.asarray(state["iteration"]))
    state["key"] = jax.numpy.asarray(state["key"])
    state["rng"] = _decode_rng(sidecar)
    return state


def _decode_rng(state: dict) -> np.random.Generator:
    rng = np.random.default_rng()
    assert state["bit_generator"] == rng.bit_generator.state["bit_generator"], (
        f"unsupported bit generator {state['bit_generator']}"
    )
    rng.bit_generator.state = state
    return rng
