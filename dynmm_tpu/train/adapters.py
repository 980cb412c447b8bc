"""Model-call adapters bridging concrete model signatures to the
``SupervisedTrainer`` contract:
``call(variables, batch, train, rng) -> (out, loss2, weight, new_model_state)``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _split_state(variables):
    return {k: v for k, v in variables.items() if k != "params"}


def dynmm_adapter(model, **model_kwargs) -> Callable:
    """Adapter for DynMM routers returning (out, resource, weight):
    IMDBDynMMNet, MoseiDynMMNetV2, MoseiTriBranchDynMMNet."""

    def call(variables, batch, train: bool, rng):
        kwargs = dict(model_kwargs)
        kwargs["train"] = train
        args = [batch["inputs"]]
        if batch.get("lengths") is not None:
            kwargs["lengths"] = batch["lengths"]
        if train:
            (out, loss2, w), new_state = model.apply(
                variables,
                *args,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
                **kwargs,
            )
        else:
            out, loss2, w = model.apply(variables, *args, **kwargs)
            new_state = _split_state(variables)
        return out, loss2, w, new_state

    return call


def mmdl_adapter(model, **model_kwargs) -> Callable:
    """Adapter for plain expert models (MMDL or encoder+head pipelines)
    returning logits only."""

    def call(variables, batch, train: bool, rng):
        kwargs = dict(model_kwargs)
        kwargs["train"] = train
        args = [batch["inputs"]]
        if batch.get("lengths") is not None:
            kwargs["lengths"] = batch["lengths"]
        if train:
            out, new_state = model.apply(
                variables,
                *args,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
                **kwargs,
            )
        else:
            out = model.apply(variables, *args, **kwargs)
            new_state = _split_state(variables)
        return out, jnp.zeros(()), None, new_state

    return call


def unimodal_adapter(model, modality_index: int, **model_kwargs) -> Callable:
    """Adapter training a single-modality encoder+head on one input stream
    (the reference's ``training_structures.unimodal``)."""

    def call(variables, batch, train: bool, rng):
        kwargs = dict(model_kwargs)
        kwargs["train"] = train
        x = batch["inputs"][modality_index]
        if batch.get("lengths") is not None:
            kwargs["lengths"] = batch["lengths"][modality_index]
        if train:
            out, new_state = model.apply(
                variables, x, rngs={"dropout": rng}, mutable=["batch_stats"], **kwargs
            )
        else:
            out = model.apply(variables, x, **kwargs)
            new_state = _split_state(variables)
        return out, jnp.zeros(()), None, new_state

    return call
