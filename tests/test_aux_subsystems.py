"""Tests for auxiliary subsystems: confusion-matrix cross-implementation
check (the reference's one real correctness test, confusion_matrix.py:181-198),
robustness sweep, He init, profiling timers, class weighting."""

import jax
import jax.numpy as jnp
import numpy as np

from dynmm_tpu.train.metrics import ConfusionMatrix, confusion_update_counts
from dynmm_tpu.train.robustness import (
    effective_robustness,
    noisy_loader,
    relative_robustness,
    robustness_sweep,
)
from dynmm_tpu.data.loader import ArrayLoader
from dynmm_tpu.utils.profiling import PhaseTimer


class TestConfusionMatrixCrossCheck:
    """Two independent implementations must agree — mirroring the reference's
    tf-vs-torch confusion-matrix cross-check."""

    def test_host_vs_device_impl(self, rng):
        n = 7
        label = rng.integers(0, n, 500)
        pred = rng.integers(0, n, 500)
        cm = ConfusionMatrix(n)
        cm.update(label, pred)
        device = np.asarray(
            confusion_update_counts(jnp.asarray(label), jnp.asarray(pred), n)
        )
        np.testing.assert_array_equal(cm.matrix, device.astype(np.int64))

    def test_miou_known_example(self):
        cm = ConfusionMatrix(2)
        cm.update(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 1]))
        # class0: tp=1 fn=1 fp=0 -> iou 0.5 ; class1: tp=2 fp=1 fn=0 -> 2/3
        np.testing.assert_allclose(cm.miou(), (0.5 + 2 / 3) / 2)

    def test_void_labels_ignored(self):
        cm = ConfusionMatrix(3)
        cm.update(np.array([-1, 0, 1]), np.array([2, 0, 1]))
        assert cm.matrix.sum() == 2  # the -1 row is dropped


class TestRobustness:
    def _loader(self):
        x0 = np.ones((8, 4), np.float32)
        x1 = np.zeros((8, 6), np.float32)
        y = np.zeros((8, 1), np.float32)
        return ArrayLoader([x0, x1], y, batch_size=4)

    def test_noisy_loader_targets_selected_modality(self):
        loader = self._loader()
        noisy = noisy_loader(loader, 1.0, modalities=[0], seed=0)
        assert not np.allclose(noisy.inputs[0], loader.inputs[0])
        np.testing.assert_array_equal(noisy.inputs[1], loader.inputs[1])

    def test_zero_noise_identity(self):
        loader = self._loader()
        noisy = noisy_loader(loader, 0.0, modalities=[0, 1])
        np.testing.assert_array_equal(noisy.inputs[0], loader.inputs[0])

    def test_sweep_and_summaries(self):
        loader = self._loader()

        def fake_eval(l):
            # metric degrades with the noise actually present in modality 0
            degradation = float(np.abs(l.inputs[0] - 1.0).mean())
            return {"accuracy": max(0.0, 1.0 - degradation)}

        curves = robustness_sweep(
            fake_eval, loader, {"image": [0]}, noise_levels=(0.0, 0.5, 1.0)
        )
        acc = curves["image"]["accuracy"]
        assert acc[0] == 1.0 and acc[-1] < acc[0]
        rr = relative_robustness(acc)
        assert 0.0 < rr <= 1.0
        assert effective_robustness(acc, acc) == 0.0
        assert effective_robustness([1.0, 1.0], [1.0, 0.5]) > 0


class TestHeInit:
    def test_reinitializes_convs_but_not_outputs(self):
        from dynmm_tpu.utils.init import apply_he_init

        params = {
            "encoder": {"conv1": {"kernel": np.zeros((3, 3, 8, 16), np.float32)}},
            "conv_out": {"kernel": np.zeros((3, 3, 16, 5), np.float32),
                         "bias": np.zeros(5, np.float32)},
            "se_layer1": {"fc1": {"kernel": np.zeros((1, 1, 16, 2), np.float32)}},
            "bn": {"scale": np.ones(8, np.float32)},
        }
        out = apply_he_init(params, jax.random.PRNGKey(0), n_classes=5)
        assert np.abs(np.asarray(out["encoder"]["conv1"]["kernel"])).sum() > 0
        np.testing.assert_array_equal(out["conv_out"]["kernel"], 0)  # output layer
        np.testing.assert_array_equal(out["se_layer1"]["fc1"]["kernel"], 0)  # SE
        np.testing.assert_array_equal(out["bn"]["scale"], 1)


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("forward"):
            pass
        with t.phase("forward"):
            pass
        logs = t.as_logs()
        assert "time_forward" in logs and logs["time_forward"] >= 0


class TestClassWeighting:
    def test_median_frequency_and_modes(self):
        from dynmm_tpu.cli.seg_build import compute_class_weights

        class DS:
            def __len__(self):
                return 2

            def load_label(self, i):
                # class 1 dominant, class 2 rare, 0 = void
                lab = np.ones((10, 10), np.uint8)
                lab[0, 0] = 2
                return lab

            def __getitem__(self, i):
                return {"label": self.load_label(i)}

        w = compute_class_weights(DS(), 2, "median_frequency")
        assert w[1] > w[0]  # rare class upweighted
        w_log = compute_class_weights(DS(), 2, "logarithmic", c=1.02)
        assert w_log[1] > w_log[0]
        w_lin = compute_class_weights(DS(), 2, "linear")
        assert w_lin[0] > w_lin[1]  # linear = raw pixel counts
        w_none = compute_class_weights(DS(), 2, "None")
        np.testing.assert_array_equal(w_none, 1)


class TestAUPRC:
    def test_matches_sklearn_average_precision(self):
        from sklearn.metrics import average_precision_score

        from dynmm_tpu.train.metrics import auprc

        rng = np.random.default_rng(0)
        labels = rng.integers(0, 2, 200)
        scores = rng.random(200) * 0.5 + labels * rng.random(200) * 0.5
        ours = auprc(scores, labels)
        ref = average_precision_score(labels, scores)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)

    def test_degenerate_no_positives(self):
        from dynmm_tpu.train.metrics import auprc

        assert auprc(np.array([0.3, 0.7]), np.array([0, 0])) == 0.0


class TestOrbaxCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from dynmm_tpu.utils.checkpoint import load_orbax, save_orbax

        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
        p = save_orbax(str(tmp_path / "ck"), state, epoch=7)
        out = load_orbax(p)
        assert out["epoch"] == 7
        np.testing.assert_array_equal(
            np.asarray(out["state"]["params"]["w"]),
            np.arange(6.0).reshape(2, 3),
        )
