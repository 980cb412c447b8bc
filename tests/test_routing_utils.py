"""core.routing.permute_rows: the dot_general path must be exact against
jnp.take for every dtype/rank it claims to handle."""

import jax.numpy as jnp
import numpy as np

from dynmm_tpu.core.routing import permute_rows


class TestPermuteRows:
    def test_float_4d_exact(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 6, 5, 40)).astype(np.float32))
        perm = jnp.asarray(np.array([3, 1, 7, 0, 5, 2, 6, 4], np.int32))
        got = np.asarray(permute_rows(x, perm))
        ref = np.asarray(jnp.take(x, perm, axis=0))
        np.testing.assert_array_equal(got, ref)

    def test_roundtrip_inverse(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 7)).astype(np.float32))
        perm = np.random.default_rng(2).permutation(16).astype(np.int32)
        inv = np.argsort(perm).astype(np.int32)
        back = permute_rows(permute_rows(x, jnp.asarray(perm)),
                            jnp.asarray(inv))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_int_and_1d_fall_back_to_take(self):
        xi = jnp.asarray(np.arange(12).reshape(6, 2).astype(np.int32))
        perm = jnp.asarray(np.array([5, 4, 3, 2, 1, 0], np.int32))
        np.testing.assert_array_equal(
            np.asarray(permute_rows(xi, perm)),
            np.asarray(jnp.take(xi, perm, axis=0)))
        x1 = jnp.asarray(np.arange(6).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(permute_rows(x1, perm)),
            np.asarray(jnp.take(x1, perm, axis=0)))

    def test_bf16(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((8, 4, 4)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        perm = jnp.asarray(np.array([7, 6, 5, 4, 3, 2, 1, 0], np.int32))
        got = np.asarray(permute_rows(x, perm).astype(jnp.float32))
        ref = np.asarray(jnp.take(x, perm, axis=0).astype(jnp.float32))
        np.testing.assert_array_equal(got, ref)


def test_bf16_uses_dot_general_path():
    # numpy's bfloat16 dtype has kind 'V'; a dtype.kind check would silently
    # demote the documented serving dtype to the slow gather (ADVICE r2).
    import jax

    x = jnp.zeros((8, 4, 4), jnp.bfloat16)
    perm = jnp.arange(8, dtype=jnp.int32)
    jaxpr = str(jax.make_jaxpr(permute_rows)(x, perm))
    assert "dot_general" in jaxpr and "gather" not in jaxpr


def test_compact_two_branch_rejects_bad_caps():
    from dynmm_tpu.core.routing import compact_two_branch

    k = jnp.asarray(np.array([1, 0, 1, 0], np.int32))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 3)).astype(np.float32))
    fn = lambda t: t * 2.0
    with np.testing.assert_raises_regex(ValueError, "capacity ladder"):
        compact_two_branch(k, x, fn, fn, (3,), caps=(0, 9, 4))
    with np.testing.assert_raises_regex(ValueError, "capacity ladder"):
        compact_two_branch(k, x, fn, fn, (3,), caps=(-1, 4))
