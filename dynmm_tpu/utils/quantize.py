"""Post-training int8 calibration driver (see ``nn/quant.py``).

Workflow (serving-side, no retraining):

    cfg_c  = dataclasses.replace(cfg, quant="calib")
    cfg_q  = dataclasses.replace(cfg, quant="int8")
    qcoll  = calibrate(ModelCls(cfg_c), float_variables, batches,
                       train=False, hard=True)
    logits = ModelCls(cfg_q).apply({**float_variables, "quant": qcoll},
                                   rgb, depth, train=False, ...)

``calibrate`` runs the float forward over the calibration stream and
accumulates each quantized conv's input abs-max into the ``quant``
collection (flax creates missing mutable collections on first apply, so
float-trained variables work directly). Scales are a running max over
batches — the standard abs-max PTQ estimator; symmetric, zero-point-free.

Calibrate with the DENSE forward (the default ``__call__``): it executes
every encoder/decoder conv including all skippable depth stages, so the
scales cover every routed path program. ``hard=True`` makes the mixing
weights (and thus post-fusion activation ranges) match hard-gate serving.
"""

from typing import Iterable, Optional, Sequence

import jax

QUANT_COLL = "quant"


def calibrate(
    model,
    variables: dict,
    batches: Iterable[Sequence],
    method=None,
    **apply_kwargs,
):
    """Run abs-max calibration; returns the ``quant`` collection.

    ``model`` must be built with ``quant='calib'``. ``variables`` is the
    float-trained tree (``params`` + ``batch_stats``); a pre-existing
    ``quant`` entry is used as the starting point (resumable). ``batches``
    yields positional input tuples (e.g. ``(rgb, depth)``), already
    preprocessed exactly like the serving inputs.
    """
    q = variables.get(QUANT_COLL)
    base = {k: v for k, v in variables.items() if k != QUANT_COLL}
    step = None
    for inputs in batches:
        if step is None:
            def step_fn(qc, *xs):
                v = dict(base) if qc is None else {**base, QUANT_COLL: qc}
                _, mut = model.apply(
                    v, *xs, mutable=[QUANT_COLL], method=method,
                    **apply_kwargs)
                return mut[QUANT_COLL]

            # first batch may create the collection (qc=None isn't a pytree
            # of arrays, so jit only after the structure exists)
            q = step_fn(q, *inputs)
            step = jax.jit(step_fn)
            continue
        q = step(q, *inputs)
    assert q is not None, "calibrate() needs at least one batch"
    return q


def quant_sanity(qcoll: dict, min_scale: float = 0.0) -> int:
    """Count calibrated scales (> min_scale); 0 means calibration never
    touched a quantized conv (wrong model mode or empty stream)."""
    leaves = jax.tree_util.tree_leaves(qcoll)
    return sum(int(x > min_scale) for x in leaves)
