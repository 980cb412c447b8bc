"""Serialized serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment story is ONNX export patches for Jetson timing
(``FusionDynMM/src/models/external_code/``, SURVEY §2.2) plus whole-pickled
torch modules; the TPU-native equivalent is a self-contained StableHLO
artifact: the chosen serving forward traced at a fixed shape with the
checkpoint weights baked in as constants. The artifact replays through
``jax.export.deserialize`` on any host with jax installed — no model code,
no checkpoint plumbing — and is specialized to the platforms listed at
export time.

Weight-baked by design: a serving artifact should be one file. For
weight-agnostic graphs export ``lambda v, r, d: ...`` yourself.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np


def export_serving_fn(
    apply_fn: Callable,
    variables,
    *arg_shapes: Sequence[int],
    dtype=None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``apply_fn(variables, *inputs)`` with ``variables`` baked
    in, traced at the given input shapes (one positional shape per model
    input — ``(rgb, depth)`` for the seg stack, ``(text, image)`` /
    ``(vision, audio, text)`` for the modality routers).

    ``dtype`` is one dtype for all inputs or a sequence per input.
    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for a multi-platform artifact.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    dtypes = (
        dtype if isinstance(dtype, (list, tuple))
        else [dtype or jnp.float32] * len(arg_shapes)
    )
    fn = jax.jit(lambda *inputs: apply_fn(variables, *inputs))
    args = tuple(
        jax.ShapeDtypeStruct(tuple(s), d) for s, d in zip(arg_shapes, dtypes)
    )
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    exported = jexport.export(fn, **kwargs)(*args)
    return exported.serialize()


def save_serving_artifact(path: str, payload: bytes) -> None:
    with open(path, "wb") as f:
        f.write(payload)


def load_serving_fn(path: str) -> Callable:
    """Deserialize an artifact; returns ``fn(*inputs)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    def fn(*inputs):
        return exported.call(*inputs)

    fn.in_avals = exported.in_avals
    return fn
