#!/usr/bin/env python
"""Per-branch MAC counting for the MM-IMDB DynMM branches — TPU-native
replacement for ``ModalityDynMM/multimedia/count_flop.py`` (thop): uses XLA's
own cost analysis on the jitted branch forwards. These numbers source the
router's flop table (imdb_dyn.py:66 hardcodes [1.25261, 10.86908] M-MACs).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from dynmm_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dynmm_tpu.models.modality import IMDBDynMMNet
    from dynmm_tpu.utils.flops import count_macs, count_params

    model = IMDBDynMMNet()
    text = jnp.zeros((1, 300))
    image = jnp.zeros((1, 4096))
    variables = model.init(jax.random.PRNGKey(0), [text, image], method=model.init_all)

    def branch(path):
        return lambda v, t, i: model.apply(v, [t, i], path, method=model.forward_branch)

    for path, name in ((1, "text"), (2, "image"), (3, "late-fusion")):
        macs = count_macs(branch(path), variables, text, image)
        print(f"branch {name}: {macs / 1e6:.5f} M MACs")
    gate = lambda v, t, i: model.apply(v, [t, i], method=model.gate_weights)
    print(f"gate: {count_macs(gate, variables, text, image) / 1e6:.5f} M MACs")
    print(f"params: {count_params(variables['params']) / 1e6:.3f} M")


if __name__ == "__main__":
    main()
