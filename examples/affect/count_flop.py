#!/usr/bin/env python
"""Per-branch MAC counting for the CMU-MOSEI DynMM branches — TPU-native
replacement for ``ModalityDynMM/affect/count_flop.py`` (thop): XLA cost
analysis over the jitted expert forwards on 50-step dummy clips (the source
of affect_dyn.py:126's [135.13226, 320.03205] M-MAC table)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.modality import MoseiDynMMNetV2
    from dynmm_tpu.utils.flops import count_macs, count_params

    model = MoseiDynMMNetV2()
    mods = [jnp.zeros((1, 50, d)) for d in (35, 74, 300)]
    lengths = [jnp.full((1,), 50, jnp.int32)] * 3
    variables = model.init(jax.random.PRNGKey(0), mods, lengths)

    def branch(path):
        return lambda v: model.apply(v, mods, lengths, infer_mode=path)[0]

    for path, name in ((1, "text transformer"), (2, "tri-modal late fusion")):
        print(f"branch {name}: {count_macs(branch(path), variables)/1e6:.5f} M MACs")
    gate = lambda v: model.apply(v, mods, lengths, method=model.gate_weights)
    print(f"gate: {count_macs(gate, variables)/1e6:.5f} M MACs")
    print(f"params: {count_params(variables['params'])/1e6:.3f} M")


if __name__ == "__main__":
    main()
