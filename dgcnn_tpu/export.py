"""AOT model export for serving (StableHLO via ``jax.export``).

The reference has no deployment story beyond pickled torch checkpoints —
serving it requires the full Python model zoo at load time.  The TPU-native
equivalent is an ahead-of-time **exported artifact**: the jitted eval
forward (fused Pallas kernels included as Mosaic custom-calls) serialized
to portable StableHLO with the trained parameters baked in as constants.
The artifact is self-contained — deserializing and calling it needs jax but
NONE of this package's model code — and is what a production inference
server should load.

Notes:

* Artifacts are platform-checked: an artifact exported under the TPU
  lowering only runs on TPU (Mosaic custom-calls), a CPU export runs on
  CPU (the kernels' XLA fallback path).  ``platforms`` defaults to the
  current backend.
* Shapes are static by default (the fused kernels are compiled per shape):
  export at the serving batch size, or export several batch sizes side by
  side with :func:`export_batches`.  ``polymorphic_batch=True`` instead
  records ONE artifact whose leading (batch) axis is a ``jax.export``
  symbolic dimension — the Mosaic kernels lower fine under it (the grid
  rides the point axis; batch is a plain loop dim) and the artifact serves
  any batch size, compiling per concrete shape on first call.
* ``call_exported``/the loaded callable re-traces nothing: calling it goes
  straight to XLA compilation of the recorded StableHLO.
"""
from __future__ import annotations

import os
from typing import Callable, Sequence

MAGIC = b"DGCNN_TPU_EXPORT\x00"


def export_eval_fn(apply_fn: Callable, variables: dict, example_args,
                   platforms: Sequence[str] | None = None,
                   polymorphic_batch: bool = False):
    """Export ``apply_fn({"params", "batch_stats"}, *args, train=False)``
    as a :class:`jax.export.Exported` with ``variables`` baked in.

    ``example_args``: arrays or ShapeDtypeStructs defining the serving
    signature (batch size, point count, extra inputs such as the partseg
    category one-hot).  With ``polymorphic_batch`` every arg's leading axis
    becomes one shared symbolic dimension ``b`` and the artifact accepts
    any batch size (all args must share the batch axis).
    """
    import jax
    from jax import export as jex

    def forward(*args):
        return apply_fn(variables, *args, train=False)

    fn = jax.jit(forward)
    if polymorphic_batch:
        (b,) = jex.symbolic_shape("b")
        shapes = tuple(
            jax.ShapeDtypeStruct((b,) + tuple(a.shape[1:]), a.dtype)
            for a in example_args)
    else:
        shapes = tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example_args)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    return jex.export(fn, **kwargs)(*shapes)


def save_exported(path: str, exported) -> None:
    """Serialize an Exported to ``path`` (atomic write)."""
    blob = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(blob)
    os.replace(tmp, path)


def load_exported_obj(path: str):
    """Load an artifact written by :func:`save_exported` as a
    :class:`jax.export.Exported` (signature avals, platforms, call)."""
    from jax import export as jex

    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(MAGIC):
        raise ValueError(f"{path} is not a dgcnn-tpu export artifact")
    return jex.deserialize(data[len(MAGIC):])


def load_exported(path: str) -> Callable:
    """Load an artifact written by :func:`save_exported`; returns a callable
    ``fn(*args) -> outputs`` (no model code needed)."""
    return load_exported_obj(path).call


def export_model(model, variables: dict, example_args,
                 platforms: Sequence[str] | None = None,
                 polymorphic_batch: bool = False):
    """Convenience wrapper over :func:`export_eval_fn` for a flax module."""
    return export_eval_fn(model.apply, variables, example_args, platforms,
                          polymorphic_batch=polymorphic_batch)


def export_from_cli(args, io, model, state, example_args, devices,
                    path: str | None = None) -> None:
    """The eval CLIs' shared ``--export_model`` hook: export the eval
    forward with the weights in ``state`` baked in, targeting the platform
    eval actually ran on (``devices`` — so ``--no_cuda`` CPU evals write
    CPU-servable artifacts, not default-backend ones), honouring
    ``--export_poly_batch``, and log the reference-style cprint line."""
    path = path or args.export_model
    poly = getattr(args, "export_poly_batch", False)
    ex = export_model(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        example_args,
        platforms=[devices[0].platform],
        polymorphic_batch=poly,
    )
    save_exported(path, ex)
    io.cprint(
        f"Exported serving artifact ({ex.platforms[0]}, batch "
        f"{'b (polymorphic)' if poly else example_args[0].shape[0]}) "
        f"to {path}"
    )


def export_batches(model, variables: dict, make_args: Callable[[int], tuple],
                   batch_sizes: Sequence[int],
                   platforms: Sequence[str] | None = None) -> dict:
    """Export one artifact per serving batch size (the fused kernels use
    static shapes); ``make_args(b)`` builds the example args for batch b.
    Returns {batch_size: Exported}."""
    return {
        b: export_model(model, variables, make_args(b), platforms)
        for b in batch_sizes
    }
