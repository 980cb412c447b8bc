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


def select_scales(qcoll, estimator: str = "absmax",
                  percentile: float = 99.9):
    """Resolve the calibration estimator into the ``in_scale`` leaves.

    ``absmax`` returns ``qcoll`` unchanged (abs-max is what ``in_scale``
    accumulates during calibration). ``percentile`` replaces every
    ``in_scale`` with the matching entry of its conv's ``in_pct`` vector
    (``nn.quant.CALIB_PERCENTILES`` grid; running max over batches of the
    within-batch quantile of |x| — a slight upper bound on the pooled
    quantile, conservative in the right direction for clipping).
    Percentile clipping trades saturation of rare outliers for finer
    resolution on the bulk of the distribution — the standard remedy when
    one outlier conv stretches the abs-max scale.
    """
    if estimator == "absmax":
        return qcoll
    if estimator != "percentile":
        raise ValueError(f"unknown calib estimator {estimator!r}")
    from dynmm_tpu.nn.quant import CALIB_PERCENTILES

    if percentile not in CALIB_PERCENTILES:
        raise ValueError(
            f"--calib_percentile must be one of {CALIB_PERCENTILES} "
            f"(got {percentile}); the grid is recorded during calibration")
    idx = CALIB_PERCENTILES.index(percentile)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        if "in_scale" in out and "in_pct" in out:
            out["in_scale"] = jax.numpy.maximum(out["in_pct"][idx], 1e-12)
        return out

    return walk(dict(qcoll))


def pack_weights(variables: dict) -> dict:
    """Pre-quantize conv weights for int8 serving (load-time, not per call).

    The in-graph form re-quantizes every f32 kernel on each jitted call —
    XLA hoists it out of scan loops but real serving pays it per batch
    (~1.1 ms/call on the flagship: one full read of the f32 param tree).
    This transform replaces each calibrated conv's ``kernel`` leaf with its
    int8 twin (``QConv`` detects the dtype and skips re-quantization) and
    stores the per-output-channel scale as ``w_scale`` in the ``quant``
    collection. Bit-exact vs the in-graph form: the same
    ``weight_scales``/``quantize_symmetric`` algebra runs once here instead
    of per call (tests/test_quantize.py::test_pack_weights_bit_exact).

    Convs are identified by their calibrated ``in_scale`` entry, so grouped
    convs (float fallback) and non-conv params are untouched.
    """
    import jax.numpy as jnp

    params = variables.get("params")
    q = variables.get(QUANT_COLL)
    assert params is not None and q, \
        "pack_weights needs 'params' and a calibrated 'quant' collection"

    def walk(p, qc):
        p_out, q_out = dict(p), dict(qc)
        if "in_scale" in qc and "kernel" in p:
            kern = jnp.asarray(p["kernel"])
            if kern.dtype != jnp.int8:  # idempotent: skip already-packed
                from dynmm_tpu.nn.quant import (quantize_symmetric,
                                                weight_scales)

                s_w = weight_scales(kern)
                p_out["kernel"] = quantize_symmetric(
                    kern, s_w[None, None, None, :])
                q_out["w_scale"] = s_w
        for k, v in qc.items():
            if isinstance(v, dict) and k in p and isinstance(p[k], dict):
                p_out[k], q_out[k] = walk(p[k], v)
        return p_out, q_out

    new_p, new_q = walk(dict(params), dict(q))
    return {**variables, "params": new_p, QUANT_COLL: new_q}


def quant_sanity(qcoll: dict, min_scale: float = 0.0) -> int:
    """Count calibrated ``in_scale`` entries (> min_scale); 0 means
    calibration never touched a quantized conv (wrong model mode or empty
    stream). Only ``in_scale`` leaves count — the ``in_pct`` percentile
    grids ride along in the collection but aren't independent convs."""
    flat, _ = jax.tree_util.tree_flatten_with_path(qcoll)
    n = 0
    for path, x in flat:
        key = getattr(path[-1], "key", None) if path else None
        if key is None or key == "in_scale":
            n += sum(int(v > min_scale)
                     for v in jax.numpy.ravel(jax.numpy.asarray(x)))
    return n
