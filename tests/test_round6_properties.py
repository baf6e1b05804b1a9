"""Randomized cross-checks of the round-6 exact-arithmetic paths
against brute-force Python references (seeded — deterministic inputs,
one Spark job per test rather than per-example). These pin the parts
DuckDB parity can't stress at fixture scale: 128-bit moments, the
negative-numerator floor corrections, and the truncating-DIV
semantics."""

from __future__ import annotations

import math
import random


def test_file_skew_audit_matches_python_reference(spark):
    from iceberg_diag_spark.operators.maintenance import file_skew_audit

    rng = random.Random(6)
    rows, ref = [], {}
    for p in range(6):
        key = f"p{p}"
        # sizes up to ~1 TiB so Σx² is far past int64
        sizes = [rng.randrange(1, 1 << 40) for _ in range(rng.randrange(1, 30))]
        for x in sizes:
            rows.append((key, x, 0))
        rows.append((key, rng.randrange(1, 1 << 30), 1))  # ignored delete
        n, s = len(sizes), sum(sizes)
        ss = sum(x * x for x in sizes)
        # same fixed-order float path as the operator: exact bigint
        # numerator -> round-to-nearest double -> sqrt -> / n -> floor
        ref[key] = {
            "n_files": n,
            "total_bytes": s,
            "min_bytes": min(sizes),
            "max_bytes": max(sizes),
            "stddev_bytes": math.floor(
                math.sqrt(float(n * ss - s * s)) / n
            ),
            "max_share_ppm": (1_000_000 * max(sizes)) // s,
        }
    files = spark.createDataFrame(
        rows, "partition_key string, file_size_in_bytes long, content int"
    )
    got = {r["partition_key"]: r for r in file_skew_audit(files).collect()}
    assert set(got) == set(ref)
    for key, want in ref.items():
        for col, val in want.items():
            assert got[key][col] == val, (key, col)


def test_dim_variance_audit_negative_mean_floor(spark):
    """Random vectors with NEGATIVE coordinates: the mean_q_ppm floor
    correction (floor != truncation for negative numerators) and the
    128-bit variance numerator must both match a big-int Python
    reference exactly."""
    from iceberg_diag_spark.operators.similarity import dim_variance_audit

    rng = random.Random(7)
    dim, n = 6, 200
    vecs = [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n)
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    # float32 round-trip first — Spark stores array<float>
    import struct as _struct

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    qs = [[math.floor(f32(x) * 1024.0) for x in v] for v in vecs]
    got = {r["pos"]: r for r in dim_variance_audit(emb).collect()}
    for d in range(dim):
        col = [q[d] for q in qs]
        s, ss = sum(col), sum(x * x for x in col)
        assert got[d]["n_vecs"] == n
        assert got[d]["mean_q_ppm"] == math.floor(1_000_000 * s / n) if abs(
            1_000_000 * s
        ) < 2**52 else True
        # exact floor-division reference (python // floors)
        assert got[d]["mean_q_ppm"] == (1_000_000 * s) // n, d
        assert got[d]["var_q"] == (n * ss - s * s) // (n * n), d


def test_dsir_logratio_matches_python_reference(spark):
    from iceberg_diag_spark.operators.textops import dsir_logratio

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        src = "tgt" if i % 3 == 0 else f"other{i % 2}"
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 15)))
        rows.append((i, text, "en", src, 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_lr_micro"])
        for r in dsir_logratio(docs, target_source="tgt").collect()
    }

    # python reference with the SAME fixed-shape double expression
    ct, cr = {}, {}
    for i, text, _, src, _ in rows:
        for t in text.split(" "):
            if src == "tgt":
                ct[t] = ct.get(t, 0) + 1
                cr.setdefault(t, 0)
            else:
                cr[t] = cr.get(t, 0) + 1
                ct.setdefault(t, 0)
    nt, nr, v = float(sum(ct.values())), float(sum(cr.values())), float(len(ct))
    lr = {
        t: math.floor(
            (math.log((ct[t] + 1) / (nt + v)) - math.log((cr[t] + 1) / (nr + v)))
            * 1_000_000.0
        )
        for t in ct
    }
    for i, text, _, _, _ in rows:
        toks = text.split(" ")
        want = (len(toks), sum(lr[t] for t in toks))
        assert got[i] == want, i
