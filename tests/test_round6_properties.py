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


def test_scd2_build_matches_python_reference(spark):
    """Random event streams with duplicate timestamps and repeated
    states: run collapse, interval tiling, version numbering and the
    tie-break must match a brute-force Python SCD2."""
    from iceberg_diag_spark.operators.events import scd2_build

    rng = random.Random(9)
    rows = []
    eid = 0
    for u in range(20):
        t = 1_000_000
        for _ in range(rng.randrange(1, 40)):
            # duplicate timestamps are common (batch ingestion):
            # advance time only 70% of steps
            if rng.random() < 0.7:
                t += rng.randrange(1, 5) * 1_000_000
            rows.append((eid, u, t, rng.choice("ABC")))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_raw long, event_type string"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(ts_raw) AS ts",
        "event_type",
    )
    got = sorted(
        (r["user_id"], r["version_seq"], r["state"],
         r["valid_from_us"], r["valid_to_us"], r["is_current"])
        for r in scd2_build(ev).collect()
    )
    # python reference: sort by (user, ts, event_id), collapse runs
    ref = []
    by_user = {}
    for e, u, t, s in rows:
        by_user.setdefault(u, []).append((t, e, s))
    for u, evs in by_user.items():
        evs.sort()
        runs = []
        for t, e, s in evs:
            if not runs or runs[-1][0] != s:
                runs.append((s, t))
        for i, (s, t) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            ref.append((u, i + 1, s, t, nxt, 0 if nxt is not None else 1))
    assert got == sorted(ref)


def test_k_anonymity_audit_invariants(spark):
    """Random tables: per-k monotonicity (violations and records at
    risk never decrease as k grows), bounds against totals, and
    exact agreement with a brute-force Python audit."""
    from iceberg_diag_spark.operators.privacy import k_anonymity_audit

    rng = random.Random(10)
    rows = [
        (rng.choice("abcd"), rng.randrange(3), f"s{rng.randrange(4)}")
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, b long, sens string")
    ks = (2, 3, 5, 8, 13)
    got = {
        r["k"]: r.asDict()
        for r in k_anonymity_audit(df, ["g", "b"], "sens", ks).collect()
    }
    classes: dict[tuple, list] = {}
    for g, b, s in rows:
        classes.setdefault((g, b), []).append(s)
    for k in ks:
        n_viol = sum(1 for v in classes.values() if len(v) < k)
        at_risk = sum(len(v) for v in classes.values() if len(v) < k)
        homog = sum(1 for v in classes.values() if len(set(v)) == 1)
        want = {
            "k": k,
            "n_classes": len(classes),
            "n_violating_classes": n_viol,
            "records_at_risk": at_risk,
            "homogeneous_classes": homog,
            "min_class_size": min(len(v) for v in classes.values()),
            "min_l": min(len(set(v)) for v in classes.values()),
        }
        assert got[k] == want, k
    seq = [got[k] for k in ks]
    for a, b in zip(seq, seq[1:]):
        assert a["n_violating_classes"] <= b["n_violating_classes"]
        assert a["records_at_risk"] <= b["records_at_risk"]
        assert b["records_at_risk"] <= len(rows)


def test_bm25_random_corpus_matches_python(spark):
    """Random corpora: BM25 micro-scores agree exactly with the
    fixed-shape Python expression for every scored doc (not just the
    top-k) when k exceeds the corpus size."""
    from iceberg_diag_spark.operators.textops import bm25_topk

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    q_terms = ("w0", "w1", "w2")
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["bm25_micro"])
        for r in bm25_topk(df, query_terms=q_terms, k=1000).collect()
    }
    toks = {i: t.split(" ") for i, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    tf = {
        (i, term): toks[i].count(term)
        for i in toks
        for term in q_terms
        if term in toks[i]
    }
    df_t = {
        term: sum(1 for (_, t2) in tf if t2 == term) for term in q_terms
    }
    ref: dict[int, tuple[int, int]] = {}
    for (i, term), c in tf.items():
        dl = len(toks[i])
        idf = math.log(1.0 + ((n_docs - df_t[term] + 0.5) / (df_t[term] + 0.5)))
        s = math.floor(
            1_000_000.0 * idf
            * ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        )
        hit, tot = ref.get(i, (0, 0))
        ref[i] = (hit + 1, tot + s)
    assert got == ref
