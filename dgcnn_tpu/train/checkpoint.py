"""Checkpoint save/load (SURVEY.md §5 checkpoint/resume).

Mirrors the reference's three formats in a JAX-native serialization
(flax msgpack; no pickles):
  (a)/(b) bare model variables  -> ``<name>.t7.msgpack``
          (reference main_cls.py:152, main_partseg.py:167)
  (c) full train checkpoints ``{epoch, state, loss}`` with optimizer +
      schedule step inside the optax state -> ``ckpt[_<epoch>].checkpoint``
      (reference main_partseg_dist.py:364-395; the step counter lives in the
      TrainState so resume restores the schedule exactly — the reference's
      scheduler_state_dict equivalent).

The reference's resume path has a latent bug (existence check on
``checkpoints/ckpt.checkpoint`` but load from ``ckpt.checkpoint`` —
main_partseg_dist.py:182-185); here both use the same path.

Compatibility note: train checkpoints serialize the optax opt_state
structurally, so they resume only into the SAME optimizer construction.
The OneCycle momentum-cycling change (optax.inject_hyperparams wrapping
the partseg --scheduler=cycle optimizer) changed that structure once —
checkpoints written before it cannot resume under cycle; bare model
variables (formats a/b) are unaffected.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_model(path: str, variables: Dict[str, Any]) -> None:
    """Save bare model variables ({params, batch_stats})."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.device_get(variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host))


def load_model(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_train_checkpoint(
    path: str, state, epoch: int, loss: float, extra: Optional[dict] = None
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": np.int64(epoch),
        "loss": np.float64(loss),
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        # optimizer states are NamedTuple pytrees; flatten to plain dicts
        "opt_state": serialization.to_state_dict(jax.device_get(state.opt_state)),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_train_variables(path: str) -> dict:
    """Eval-side restore of a ``save_train_checkpoint`` file without a
    TrainState template: just {"params", "batch_stats"} — the reference
    evals its own ``transformer_<epoch>.checkpoint`` the same way
    (main_partseg.py:166-171)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return {"params": payload["params"],
            "batch_stats": payload["batch_stats"]}


def is_torch_checkpoint(path: str) -> bool:
    """Whether a file is a torch pickle/zip checkpoint (as opposed to this
    framework's msgpack payloads, which reuse the reference's .t7 /
    .checkpoint file names)."""
    with open(path, "rb") as f:
        head = f.read(2)
    return head[:1] == b"\x80" or head == b"PK"


def load_train_checkpoint(path: str, state) -> Tuple[Any, int, float]:
    """Restore a TrainState (template ``state`` supplies the pytree structure
    for the optimizer state) -> (state, epoch, loss)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    opt_state = serialization.from_state_dict(state.opt_state, payload["opt_state"])
    restored = state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=opt_state,
    )
    return restored, int(payload["epoch"]), float(payload["loss"])


# ------------------------------------------------------------------- orbax

def save_orbax(path: str, state, epoch: int, loss: float) -> None:
    """Orbax-backed checkpoint (async-capable, multi-host-safe) — the
    production alternative to the msgpack files above."""
    import orbax.checkpoint as ocp

    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "meta": {"epoch": epoch, "loss": float(loss)},
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_orbax_variables(path: str) -> dict:
    """Eval-side restore of an orbax checkpoint dir: just
    {"params", "batch_stats"} (the orbax analogue of
    ``load_train_variables``)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    return {"params": payload["params"],
            "batch_stats": payload["batch_stats"]}


def load_orbax(path: str, state) -> Tuple[Any, int, float]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    opt_state = serialization.from_state_dict(
        state.opt_state, payload["opt_state"])
    restored = state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=opt_state,
    )
    return restored, int(payload["meta"]["epoch"]), float(payload["meta"]["loss"])
