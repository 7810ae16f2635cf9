"""Learned-model inference stages (pipelines/inference.py): offline
training determinism + artifact quality, actor-pool forward-pass
exactness, and hash-parity with the generated SQL mirrors — the
load-model-once / batched-forward pattern (round-4 review's top missing
component).  Reference parity: n/a (yaschva has no model stage)."""

import sys

import duckdb
import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from yaschva_ray.pipelines import inference  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/documents.parquet')")
    return c


def test_training_reproduces_pinned_artifact(ray_session):
    """Retraining on the artifact's own corpus must reproduce the
    pinned quantized weights (the trainer is RNG-free: zero init, fixed
    iters, full batch — the only nondeterminism candidate is BLAS
    reduction order, which is stable within one machine)."""
    art = inference.train_quality_model_from_dir(SF_DIR)
    assert art["weights"] == inference.QUALITY_MODEL["weights"]
    assert art["bias"] == inference.QUALITY_MODEL["bias"]
    assert art["scale"] == inference.QUALITY_MODEL["scale"]


def test_artifact_approximates_teacher(ray_session):
    """The deployed linear model genuinely approximates the nonlinear
    teacher: >= 80% agreement, and both classes are actually
    predicted (no degenerate always-yes classifier)."""
    from yaschva_ray.pipelines.textops import _gather, _read

    t = _gather(_read(SF_DIR, "documents", ["doc_id", "text"]))
    F = inference.feature_matrix(t["text"])
    y = inference.c4_teacher_labels(F)
    logit = (F @ np.asarray(inference.QUALITY_MODEL["weights"], np.int64)
             + inference.QUALITY_MODEL["bias"])
    pred = logit > 0
    assert 0.05 < y.mean() < 0.95          # teacher is non-degenerate
    assert 0.05 < pred.mean() < 0.95       # so is the student
    assert ((pred == (y > 0.5)).mean()) >= 0.80
    # and it is NOT a memorized hyperplane: some disagreement exists
    assert (pred != (y > 0.5)).any()


def test_quality_scores_match_oracle(ray_session, con):
    out = inference.q_model_quality_scores(SF_DIR)
    ora = con.execute(inference.quality_scores_oracle_sql()).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows > 0


def test_scorer_stage_loads_model_once(ray_session):
    """The stage fetches the artifact in __init__ (once per actor) and
    the per-batch path is a pure matvec — scoring two disjoint batches
    equals scoring their concatenation."""
    import ray

    ref = ray.put(inference.QUALITY_MODEL)
    stage = inference.QualityScorerStage(model_ref=ref)
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["the cat sat on it",
                                    "aaa bbb", "", "the the the the "
                                    "and of to a in is it that " * 8])})
    whole = stage(t)
    split = pa.concat_tables([stage(t.slice(0, 2)), stage(t.slice(2))])
    assert whole.equals(split)
    assert whole.column_names == ["doc_id", "logit_fp", "pred_keep"]


def test_embed_documents_match_oracle(ray_session, con):
    out = inference.q_embed_documents(SF_DIR)
    ora = con.execute(inference.embed_documents_oracle_sql()).arrow()
    assert out.equals(ora.cast(out.schema))


def test_embed_similarity_topk_matches_oracle(ray_session, con):
    out = inference.q_embed_similarity_topk(SF_DIR)
    ora = con.execute(inference.embed_similarity_oracle_sql()).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows == 10
    # scores strictly ordered desc, ties by doc_id asc
    rows = out.to_pylist()
    for a, b in zip(rows, rows[1:]):
        assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])


def test_embed_projection_deterministic():
    a = inference.embed_projection()
    b = inference.embed_projection()
    assert (a == b).all()
    assert a.shape == (26, 8)
    assert a.min() >= -9 and a.max() <= 9


def test_curate_with_model_matches_oracle(ray_session, con):
    out = inference.q_curate_with_model(SF_DIR)
    ora = con.execute(inference.curate_with_model_oracle_sql()).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows > 0
    # the gate genuinely filtered something and every kept logit > 0
    assert out.num_rows < 500
    assert all(v > 0 for v in out["logit_fp"].to_pylist())
    assert set(out["split"].to_pylist()) <= {"train", "val"}


def test_feature_matrix_null_text_scores_as_empty():
    import pyarrow as pa

    F = inference.feature_matrix(pa.array([None, ""], pa.string()))
    assert (F[0] == F[1]).all()
    assert (F[0] == 0).all()


def test_distributed_trainer_matches_local_quantized(ray_session):
    """The distributed GD loop (per-block gradient partials) reproduces
    the driver-local trainer: float weights to ~1 ulp and the QUANTIZED
    artifact exactly — including under a different partitioning (the
    int64 moment partials are partition-independent; the float gradient
    merge differs only in last-ulp association)."""
    from yaschva_ray.pipelines.textops import _gather, _read

    t = _gather(_read(SF_DIR, "documents", ["doc_id", "text"]))
    F = inference.feature_matrix(t["text"])
    local = inference.train_quality_classifier(
        F, inference.c4_teacher_labels(F))
    ql = inference.quantize_model(local)
    for reparts in (None, 7):
        ds = _read(SF_DIR, "documents", ["doc_id", "text"])
        if reparts:
            ds = ds.repartition(reparts)
        dist = inference.train_quality_classifier_distributed(ds)
        assert np.allclose(dist["w"], local["w"], rtol=1e-8)
        qd = inference.quantize_model(dist)
        assert qd["weights"] == ql["weights"]
        assert qd["bias"] == ql["bias"]
    # and the pinned deployed artifact is what this corpus trains to
    assert ql["weights"] == inference.QUALITY_MODEL["weights"]


def test_model_train_report_query(ray_session):
    rep = inference.q_model_train_report(SF_DIR)
    vals = dict(zip(rep["param"].to_pylist(), rep["value"].to_pylist()))
    assert vals["n_rows"] == 500
    assert vals["n_teacher_agree"] >= 400      # >= 80% agreement
    assert vals["bias"] == inference.QUALITY_MODEL["bias"]
    for n, w in zip(inference.FEATURE_NAMES,
                    inference.QUALITY_MODEL["weights"]):
        assert vals[f"w_{n}"] == w


def test_pca_projection_exact_covariance_properties(ray_session):
    """train_pca_projection: partition-IDENTICAL (int64 moment
    partials), orthonormal, variance-ordered, and matching numpy's full
    eigendecomposition of the same covariance."""
    from yaschva_ray.pipelines.textops import _gather, _read

    Q1 = inference.train_pca_projection(
        _read(SF_DIR, "documents", ["doc_id", "text"]))
    Q2 = inference.train_pca_projection(
        _read(SF_DIR, "documents", ["doc_id", "text"]).repartition(7))
    assert np.array_equal(Q1, Q2)
    assert Q1.shape == (26, inference.EMBED_DIM)
    assert np.allclose(Q1.T @ Q1, np.eye(inference.EMBED_DIM),
                       atol=1e-10)
    t = _gather(_read(SF_DIR, "documents", ["doc_id", "text"]))
    X = inference.letter_counts(t["text"]).astype(float)
    Xc = X - X.mean(axis=0)
    var = np.sort(((Xc @ Q1) ** 2).mean(axis=0))[::-1]
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(len(var) - 1))
    w = np.sort(np.linalg.eigh(Xc.T @ Xc / len(X))[0])[::-1]
    assert np.allclose(var, w[:inference.EMBED_DIM], rtol=1e-4)


def test_pca_embed_documents_query(ray_session):
    out = inference.q_pca_embed_documents(SF_DIR)
    assert out.num_rows == 500
    assert out.column_names == ["doc_id"] + [
        f"e{j}" for j in range(inference.EMBED_DIM)]
    # first component carries the dominant variance (doc length axis)
    import statistics
    e0 = out["e0"].to_pylist()
    e1 = out["e1"].to_pylist()
    assert statistics.pvariance(e0) > statistics.pvariance(e1)


def test_f0_span_quality_matches_oracle(ray_session):
    """Classifier scoring over the north-rule interleaved table:
    per-span rejections hash-match the unnest + weights-inlined
    mirror; NULL-text spans score as empty."""
    import duckdb

    out = inference.q_f0_span_quality(SF_DIR)
    c = duckdb.connect()
    ora = c.execute(inference.f0_span_quality_oracle_sql()).arrow()
    assert out.equals(ora.cast(out.schema))
    assert out.num_rows > 100
    assert all(v <= 0 for v in out["logit_fp"].to_pylist())


def test_distributed_trainer_checkpoint_resume_bit_identical(
        ray_session, tmp_path):
    """Kill-at-iteration-200 then resume reaches BIT-IDENTICAL weights
    to an uninterrupted 400-iteration run (deterministic GD + exact
    recomputed standardization; atomic checkpoint writes)."""
    import json as _json

    from yaschva_ray.pipelines.textops import _read

    ck = str(tmp_path / "train_ck.json")
    # "crashed" run: stops at 200 iterations, checkpointing every 50
    inference.train_quality_classifier_distributed(
        _read(SF_DIR, "documents", ["doc_id", "text"]),
        iters=200, checkpoint_path=ck, checkpoint_every=50)
    assert _json.load(open(ck))["iter"] == 200
    # resume to 400
    resumed = inference.train_quality_classifier_distributed(
        _read(SF_DIR, "documents", ["doc_id", "text"]),
        iters=400, checkpoint_path=ck, checkpoint_every=50)
    whole = inference.train_quality_classifier_distributed(
        _read(SF_DIR, "documents", ["doc_id", "text"]), iters=400)
    assert np.array_equal(resumed["w"], whole["w"])
    assert resumed["b"] == whole["b"]
    # and the artifact still matches the pinned one
    q = inference.quantize_model(resumed)
    assert q["weights"] == inference.QUALITY_MODEL["weights"]
