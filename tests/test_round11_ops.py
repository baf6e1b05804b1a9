"""Round-11 operator contracts: classifier_train_lr (LR training
closes the score/evaluate/train classifier loop), the IVF index-build
sink, and the incremental-release streaming twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.operators.textops import (
    LR_WEIGHT_COLS,
    _lr_standardized,
    _scored_vs_gate,
    classifier_train_lr,
    exact_auc,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _auc_ppm(df):
    return df.collect()[0].auc_ppm


def test_train_lr_trajectory_shape(spark, docs):
    traj = classifier_train_lr(docs, k_steps=3).collect()
    assert [r.step for r in traj] == [0, 1, 2, 3]
    # step 0 is the zero init; step 1 must move every weight the
    # gradient touches (the bias always moves unless classes balance
    # to the floor exactly — assert at least one weight moved)
    assert all(traj[0][c] == 0 for c in LR_WEIGHT_COLS)
    assert any(traj[1][c] != 0 for c in LR_WEIGHT_COLS)


def test_trained_weights_beat_handset_auc(spark, docs):
    """The round-11 brief's acceptance: 12 GD steps must RANK the
    curation gate better than the hand-set CLASSIFIER_WEIGHTS do,
    measured by the same exact tie-corrected AUC operator the engine
    ships (classifier_auc_calibration's core)."""
    final = classifier_train_lr(docs).orderBy(F.desc("step")).first()
    w = [final[c] for c in LR_WEIGHT_COLS]

    feat = _lr_standardized(docs, "text")
    fcols = ["x0"] + [f"sx{j}" for j in range(1, 6)]
    zsum = " + ".join(
        f"CAST({wj} AS DECIMAL(38,0)) * {x}" for wj, x in zip(w, fcols)
    )
    scored_trained = feat.select(
        F.expr(
            f"CAST(CASE WHEN ({zsum}) < 0"
            f" THEN -((-({zsum})) DIV 1000000)"
            f" ELSE ({zsum}) DIV 1000000 END AS BIGINT)"
        ).alias("score"),
        "y",
    )
    auc_trained = _auc_ppm(exact_auc(scored_trained, "score", "y"))
    auc_hand = _auc_ppm(
        exact_auc(_scored_vs_gate(docs, "text"), "z_micro", "y")
    )
    assert auc_trained is not None and auc_hand is not None
    assert auc_trained > auc_hand, (auc_trained, auc_hand)
    # and not by luck: the measured gap at sf0.001 is ~5 AUC points
    # (916504 -> 965027 ppm); pin a conservative floor
    assert auc_trained >= auc_hand + 20_000, (auc_trained, auc_hand)


def test_train_lr_deterministic(spark, docs):
    a = classifier_train_lr(docs, k_steps=2).collect()
    b = classifier_train_lr(docs, k_steps=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------------
# IVF index build sink (advisor-executing pattern #6)
# ---------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def built_index(spark, emb, tmp_path_factory):
    from iceberg_diag_spark.operators import similarity as sim

    path = str(tmp_path_factory.mktemp("ivf_index"))
    manifest = sim.ivf_build_index(emb, path).localCheckpoint()
    return path, manifest


def test_ivf_probe_reproduces_topk_exact(spark, emb, built_index):
    """The round-11 brief's acceptance: a consumer-side probe of the
    WRITTEN index must reproduce ivf_topk_exact's top-k bit for bit —
    same candidates, same ranks, same cosines."""
    from iceberg_diag_spark.operators import similarity as sim

    path, _ = built_index
    probe = sorted(
        tuple(r) for r in sim.ivf_probe_index(spark, path, emb).collect()
    )
    ref = sorted(tuple(r) for r in sim.ivf_topk_exact(emb).collect())
    assert probe == ref and len(probe) > 0


def test_ivf_manifest_matches_plan_side_and_accounts_all_vectors(
    spark, emb, built_index
):
    from iceberg_diag_spark.operators import similarity as sim

    _, manifest = built_index
    file_m = sorted(tuple(r) for r in manifest.collect())
    plan_m = sorted(
        tuple(r)
        for r in sim._ivf_manifest_agg(
            sim.ivf_index_assignments(emb)
        ).collect()
    )
    assert file_m == plan_m
    assert sum(r[1] for r in file_m) == emb.count()  # no dropped rows


def test_ivf_verify_detects_tampering(spark, emb, built_index):
    """verify_ivf_index over the intact index is all-ok; delivering a
    TAMPERED copy (one cell's rows dropped) must flag exactly the
    tampered cell."""
    from pyspark.sql import functions as F

    from iceberg_diag_spark.operators import similarity as sim

    path, manifest = built_index
    ver = sim.verify_ivf_index(spark, path, manifest).collect()
    assert ver and all(r.ok for r in ver)

    rows = spark.read.parquet(path)
    victim = manifest.orderBy("list_id").first().list_id
    tampered = rows.filter(
        ~((F.col("list_id") == victim) & (F.col("vec_id") % 2 == 0))
    )
    import tempfile

    tpath = tempfile.mkdtemp(prefix="ivf_tampered_")
    tampered.write.mode("overwrite").partitionBy("list_id").parquet(tpath)
    bad = {
        r.list_id: r.ok
        for r in sim.verify_ivf_index(spark, tpath, manifest).collect()
    }
    assert bad[victim] is False
    assert all(ok for lid, ok in bad.items() if lid != victim)
