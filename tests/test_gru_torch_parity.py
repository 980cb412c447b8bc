"""GRU numerical parity against torch.nn.GRU with copied weights — validates
that the masked-scan GRU is a faithful replacement for the reference's
packed-sequence torch GRUs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dynmm_tpu.nn.sequence import GRU


def copy_torch_gru_weights(tgru: torch.nn.GRU, variables, hidden: int):
    """Map torch GRU l0 weights into the flax GRUCell param tree.

    torch packs gates rows as [r, z, n]; flax GRUCell uses separate dense
    layers ir/iz/in (input) and hr/hz/hn (hidden). torch applies
    n = tanh(W_in x + b_in + r*(W_hn h + b_hn)) — flax matches with the
    hn dense carrying its own bias.
    """
    w_ih = tgru.weight_ih_l0.detach().numpy()  # (3H, in)
    w_hh = tgru.weight_hh_l0.detach().numpy()  # (3H, H)
    b_ih = tgru.bias_ih_l0.detach().numpy()
    b_hh = tgru.bias_hh_l0.detach().numpy()
    H = hidden
    cell = variables["params"]["scan"]["cell"]

    def put(dense, w, b=None):
        dense["kernel"] = jnp.asarray(w.T)
        if b is not None and "bias" in dense:
            dense["bias"] = jnp.asarray(b)

    # flax folds the hidden-side r/z biases into the input dense (hr/hz have
    # no bias): ir.bias = b_ir + b_hr, iz.bias = b_iz + b_hz. The n gate keeps
    # separate biases (hn.bias multiplies with r, like torch's b_hn).
    put(cell["ir"], w_ih[:H], b_ih[:H] + b_hh[:H])
    put(cell["iz"], w_ih[H : 2 * H], b_ih[H : 2 * H] + b_hh[H : 2 * H])
    put(cell["in"], w_ih[2 * H :], b_ih[2 * H :])
    put(cell["hr"], w_hh[:H])
    put(cell["hz"], w_hh[H : 2 * H])
    put(cell["hn"], w_hh[2 * H :], b_hh[2 * H :])
    return variables


def test_gru_matches_torch(rng):
    in_dim, hidden, time, batch = 12, 16, 9, 3
    x = rng.standard_normal((batch, time, in_dim)).astype(np.float32)

    tgru = torch.nn.GRU(in_dim, hidden, batch_first=True)
    with torch.no_grad():
        out_t, h_t = tgru(torch.tensor(x))

    model = GRU(hidden_dim=hidden, last_only=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables = copy_torch_gru_weights(tgru, variables, hidden)

    ours = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours), out_t.numpy(), rtol=1e-4, atol=1e-5
    )


def test_gru_last_state_matches_torch_with_lengths(rng):
    """Masked final state == torch pack_padded_sequence final hidden."""
    in_dim, hidden, time = 6, 8, 7
    lengths = np.array([7, 4, 2])
    x = rng.standard_normal((3, time, in_dim)).astype(np.float32)

    tgru = torch.nn.GRU(in_dim, hidden, batch_first=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False,
    )
    with torch.no_grad():
        _, h_t = tgru(packed)

    model = GRU(hidden_dim=hidden, last_only=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = copy_torch_gru_weights(tgru, variables, hidden)
    ours = model.apply(variables, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(
        np.asarray(ours), h_t[0].numpy(), rtol=1e-4, atol=1e-5
    )
