"""Metric-suite tests, cross-checked against sklearn when available."""

import numpy as np
import pytest

from medical_image_classification_tpu.evaluate.metrics import (
    classification_metrics, confusion_matrix, count_parameters,
    metrics_to_csv, roc_auc_ovr,
)


def test_confusion_matrix():
    cm = confusion_matrix([0, 1, 1, 2], [0, 1, 2, 2], 3)
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[1, 2] == 1 and cm[2, 2] == 1


def test_perfect_prediction():
    y = np.array([0, 1, 2, 0, 1, 2])
    m = classification_metrics(y, y, num_classes=3)
    for k in ["accuracy", "precision_macro", "recall_macro",
              "specificity_macro", "f1_macro"]:
        assert m[k] == 1.0


def test_metrics_match_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    y = rng.randint(0, 4, 200)
    scores = rng.rand(200, 4)
    scores[np.arange(200), y] += 0.5          # informative scores
    pred = scores.argmax(1)
    m = classification_metrics(y, pred, scores, num_classes=4)
    np.testing.assert_allclose(m["accuracy"], sk.accuracy_score(y, pred))
    np.testing.assert_allclose(
        m["precision_macro"],
        sk.precision_score(y, pred, average="macro", zero_division=0))
    np.testing.assert_allclose(
        m["recall_macro"],
        sk.recall_score(y, pred, average="macro", zero_division=0))
    np.testing.assert_allclose(
        m["f1_macro"], sk.f1_score(y, pred, average="macro", zero_division=0))
    prob = scores / scores.sum(1, keepdims=True)
    np.testing.assert_allclose(
        m_auc := roc_auc_ovr(y, prob),
        sk.roc_auc_score(y, prob, multi_class="ovr", average="macro"),
        rtol=1e-10)


def test_count_and_csv(tmp_path):
    import jax.numpy as jnp
    params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert count_parameters(params) == 17
    p = tmp_path / "m.csv"
    metrics_to_csv(str(p), {"accuracy": 0.9}, extra={"params": 17})
    text = p.read_text()
    assert "accuracy" in text and "17" in text


def test_trace_summary_parses():
    """summarize_trace parses a profiler capture without error (device-op
    rows only exist on TPU; on CPU the totals are simply zero)."""
    import jax
    import jax.numpy as jnp

    from medical_image_classification_tpu.utils import profiling

    with profiling.trace("/tmp/mic_trace_test"):
        jax.jit(lambda a: jnp.sin(a) @ a.T)(jnp.ones((64, 64))).block_until_ready()
    s = profiling.summarize_trace("/tmp/mic_trace_test")
    assert set(s) == {"total_ms", "by_category", "by_source", "by_op"}
    assert s["total_ms"] >= 0.0
