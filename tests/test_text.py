"""Text analysis functions: langid, counts, quality, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.functions import text as TX


def one(spark, s, col):
    return spark.createDataFrame([(s,)], "text string").select(col.alias("v")).collect()[0]["v"]


def test_detect_lang(spark):
    assert one(spark, "the cat and the dog is to go", TX.detect_lang(F.col("text"))) == "en"
    assert one(spark, "der hund und die katze ist nicht", TX.detect_lang(F.col("text"))) == "de"
    assert one(spark, "le chat est une la les", TX.detect_lang(F.col("text"))) == "fr"
    assert one(spark, "xyzzy plugh 12345", TX.detect_lang(F.col("text"))) == "und"


def test_token_counts(spark):
    assert one(spark, "a b  c", TX.whitespace_token_count(F.col("text"))) == 3
    assert one(spark, "", TX.whitespace_token_count(F.col("text"))) == 0
    assert one(spark, "hello, world 42", TX.bpe_ish_token_count(F.col("text"))) == 4


def test_quality_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.select(TX.quality_score(F.col("text")).alias("q"))
    row = q.agg(F.min("q").alias("lo"), F.max("q").alias("hi")).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_rolling_hash_matches_python(spark):
    s = "hello spark"
    expect = 0
    for ch in s:
        expect = (expect * 257 + ord(ch)) % 1_000_000_007
    assert one(spark, s, TX.rolling_hash(F.col("text"))) == expect


def test_fingerprint_md5_dedup_key(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "text string")
    n = df.select(TX.fingerprint_md5(F.col("text")).alias("fp")).distinct().count()
    assert n == 2


def test_repetition_metrics_hand_values(spark):
    """'a b a b a' → 5 words {a,b} → dup_word 0.6; 2-grams
    [a b, b a, a b, b a] → 2 distinct of 4 → dup_2gram 0.5;
    top word 'a' 3/5 → 0.6."""
    df = spark.createDataFrame([("a b a b a",), ("x y z",), ("",)], "text string")
    rows = df.select(
        TX.dup_word_frac(F.col("text")).alias("dw"),
        TX.dup_2gram_frac(F.col("text")).alias("dg"),
        TX.top_word_frac(F.col("text")).alias("tw"),
        TX.repetition_gate(F.col("text")).alias("keep"),
    ).collect()
    assert (rows[0]["dw"], rows[0]["dg"], rows[0]["tw"]) == (0.6, 0.5, 0.6)
    assert rows[0]["keep"] is False
    assert (rows[1]["dw"], rows[1]["dg"], rows[1]["tw"]) == (0.0, 0.0, round(1 / 3, 6))
    assert rows[1]["keep"] is False  # top_word 1/3 > 0.2 on tiny docs
    assert (rows[2]["dw"], rows[2]["dg"], rows[2]["tw"]) == (0.0, 0.0, 0.0)


def test_repetition_zero_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.select(TX.dup_2gram_frac(F.col("text")).alias("d"))
    assert "Exchange" not in q._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_and_counts(spark):


    rows = [
        (1, "mail a.b+c@foo-bar.org and 192.168.0.1 call +1 555 0100 done"),
        (2, "no pii here, just 1.2 numbers and an @ sign alone"),
        (3, "two mails x@y.io z@w.co one ip 10.0.0.255"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: r
        for r in df.select(
            "id", *TX.pii_counts(F.col("t")), TX.scrub_pii(F.col("t")).alias("s")
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[1]["s"] == "mail <EMAIL> and <IP> call <PHONE> done"
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["s"] == rows[1][1]  # untouched
    assert (out[3]["n_email"], out[3]["n_ip"]) == (2, 1)
    assert out[3]["s"] == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_normalize_text_collapses_variants(spark):
    from bitquery_kafka_streams_rust_spark.functions.text import (
        fingerprint_md5,
        normalize_text,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO---WORLD"),
            (4, "  hello   world  "),
            (5, "hello worlds"),  # genuinely different
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        normalize_text(F.col("text")).alias("nt"),
        fingerprint_md5(normalize_text(F.col("text"))).alias("fp"),
    ).collect()
    nts = {r["doc_id"]: r["nt"] for r in out}
    fps = {r["doc_id"]: r["fp"] for r in out}
    assert nts[1] == nts[2] == nts[3] == nts[4] == "hello world"
    assert len({fps[1], fps[2], fps[3], fps[4]}) == 1
    assert fps[5] != fps[1]


def test_classifier_logit_matches_python(spark):
    """classifier_logit replays the hashing-trick arithmetic exactly:
    poly-hash each word into 256 buckets, Knuth-lattice weight per
    bucket, mean + bias.  Weights are dyadic rationals so the Python
    float replay is bit-exact (no summation-order slack to hide in)."""
    text = "The quick brown Fox jumps  over the lazy dog"

    def py_logit(t, dim=256, bias=0.0):
        words = [w for w in t.lower().split() if w]
        tot = 0.0
        for w in words:
            h = 0
            for ch in w:
                h = (h * 313 + ord(ch)) % 2147483647
            b = h % dim
            tot += ((b + 1) * 2654435761 % 2**31) / 2**31 - 0.5
        return round(bias + tot / max(len(words), 1), 6)

    got = one(spark, text, TX.classifier_logit(F.col("text")))
    assert got == py_logit(text)
    # score = sigmoid of the ROUNDED logit, rounded to 6
    import math

    s = one(spark, text, TX.classifier_score(F.col("text")))
    assert s == round(1.0 / (1.0 + math.exp(-py_logit(text))), 6)


def test_classifier_deterministic_and_bounded(spark, sf_dir):
    """Scores are pure functions of the text (rerun-identical) and land
    in (0, 1); empty text yields the bias-only logit."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = docs.select(
        "doc_id", TX.classifier_score(F.col("text")).alias("s")
    )
    rows = {r["doc_id"]: r["s"] for r in out.collect()}
    again = {r["doc_id"]: r["s"] for r in out.collect()}
    assert rows == again
    assert all(0.0 < v < 1.0 for v in rows.values())
    assert one(spark, "", TX.classifier_logit(F.col("text"), bias=1.5)) == 1.5


def test_curation_cli_classifier_gate(spark, sf_dir, tmp_path):
    """--classifier-min-score cuts exactly the docs below the score
    threshold (same surviving set as applying the column filter
    directly)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/jobs")
    import run_curation as J

    rc = J.main([
        "--input", f"{sf_dir}/documents.parquet",
        "--classifier-min-score", "0.5",
        "--splits", "all=1.0",
        "--output", str(tmp_path / "cls"),
    ])
    assert rc == 0
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "cls")).select("doc_id").collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {
        r["doc_id"]
        for r in docs.where(
            TX.classifier_score(F.col("text")) >= 0.5
        ).select("doc_id").collect()
    }
    assert kept == expect and 0 < len(kept) < docs.count()


def test_langid_confusion_query_shape(spark, sf_dir):
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    rows = E.queries()["doc_langid_confusion"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # shares per actual language sum to 1
    for lang, rs in by_lang.items():
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-5
    # zh has no marker set: its mass lands on other codes/und, and the
    # detector never invents a 'zh' prediction
    assert all(r["pred"] != "zh" for r in rows)
